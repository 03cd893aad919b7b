package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/src/Optimizer/tests/gtest_plan_check_tpcds1000.cpp):
  *
  *  - q47/q57 flavor: monthly series vs the yearly average in one
  *    window pass, the ±1-month neighbors via lag/lead over a SECOND
  *    ordering of the same partition, deviation-ranked — the
  *    two-window-specs-one-sort-family shape;
  *  - q31 flavor: one entity dimension × two channels × three
  *    consecutive quarters as SIX grouped subqueries of the same fact
  *    joined on the entity, share-growth ratios compared cross-channel
  *    — the join-of-many-aggregates shape the reference's optimizer
  *    gates on (CTE reuse + broadcast of the small grouped sides).
  */
object TpcdsShapes4 {
  import Num._

  val defs: Seq[QueryDef] = Seq(

    // q47/q57: priority-months deviating >10% from their year's average,
    // with the previous/next month's revenue alongside.
    QueryDef(
      "tpcds_monthly_dev_neighbors",
      (s, dir) => {
        val m = Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("mo"))
          .agg(lsum2(col("o_totalprice")).as("rev"))
        val wYear = Window.partitionBy(col("prio"), col("y"))
        val wSeq = Window.partitionBy(col("prio")).orderBy(col("y"), col("mo"))
        m.withColumn("avg_rev",
            (sum(round(col("rev") * 100).cast("long")).over(wYear) /
              count(lit(1)).over(wYear)) / 100.0)
          .withColumn("prev_rev", lag(col("rev"), 1).over(wSeq))
          .withColumn("next_rev", lead(col("rev"), 1).over(wSeq))
          .filter(col("avg_rev") > 0 &&
            abs(col("rev") - col("avg_rev")) / col("avg_rev") > 0.1)
          .select(col("prio"), col("y"), col("mo"),
            round(col("rev"), 2).as("rev"),
            round(col("avg_rev"), 2).as("avg_rev"),
            round(col("prev_rev"), 2).as("prev_rev"),
            round(col("next_rev"), 2).as("next_rev"),
            round(abs(col("rev") - col("avg_rev")) / col("avg_rev"), 6).as("dev"))
          .orderBy(desc("dev"), col("prio"), col("y"), col("mo"))
          .limit(40)
      },
      Some("""
        WITH m AS (
          SELECT o_orderpriority AS prio, YEAR(o_orderdate) AS y,
            MONTH(o_orderdate) AS mo,
            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
          FROM orders GROUP BY 1, 2, 3),
        w AS (
          SELECT prio, y, mo, rev,
            CAST(SUM(CAST(ROUND(rev * 100) AS BIGINT)) OVER (PARTITION BY prio, y) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY prio, y) / 100.0 AS avg_rev,
            LAG(rev) OVER (PARTITION BY prio ORDER BY y, mo) AS prev_rev,
            LEAD(rev) OVER (PARTITION BY prio ORDER BY y, mo) AS next_rev
          FROM m)
        SELECT prio, y, mo,
          ROUND(rev, 2) AS rev, ROUND(avg_rev, 2) AS avg_rev,
          ROUND(prev_rev, 2) AS prev_rev, ROUND(next_rev, 2) AS next_rev,
          ROUND(ABS(rev - avg_rev) / avg_rev, 6) AS dev
        FROM w
        WHERE avg_rev > 0 AND ABS(rev - avg_rev) / avg_rev > 0.1
        ORDER BY dev DESC, prio, y, mo
        LIMIT 40""")),

    // q49: worst return ratios per channel — three per-channel grouped
    // frames, each ranked by its own window, UNION ALL'd and re-sorted
    // (the rank-inside-union-arms shape; returns = l_returnflag = 'R').
    QueryDef(
      "tpcds_return_ratio_ranks",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .withColumn("channel",
            when(col("l_suppkey") % 3 === 0, "air")
              .when(col("l_suppkey") % 3 === 1, "sea")
              .otherwise("land"))
        def arm(ch: String) = {
          val g = li.filter(col("channel") === ch)
            .groupBy((col("l_partkey") % 50).as("part_bucket"))
            .agg(
              sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)
                .cast(Num.D2)).as("ret_qty"),
              sum(col("l_quantity").cast(Num.D2)).as("tot_qty"))
          val ratio = (col("ret_qty") / col("tot_qty")).cast("double")
          g.select(lit(ch).as("channel"), col("part_bucket"), ratio.as("ratio"))
            .withColumn("rnk", rank().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(lit(ch)).orderBy(col("ratio").desc)))
            .filter(col("rnk") <= 10)
        }
        arm("air").unionByName(arm("sea")).unionByName(arm("land"))
          .select(col("channel"), col("part_bucket"),
            Num.dq6(col("ratio")).as("ratio"), col("rnk"))
          .orderBy(col("channel"), col("rnk"), col("part_bucket"))
      },
      Some("""
        WITH li AS (
          SELECT CASE WHEN l_suppkey % 3 = 0 THEN 'air'
                      WHEN l_suppkey % 3 = 1 THEN 'sea'
                      ELSE 'land' END AS channel,
            l_partkey % 50 AS part_bucket, l_returnflag, l_quantity
          FROM lineitem),
        g AS (
          SELECT channel, part_bucket,
            CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END
              AS DECIMAL(18,2))) AS DOUBLE)
              / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ratio
          FROM li GROUP BY 1, 2),
        r AS (
          SELECT channel, part_bucket, ratio,
            CAST(RANK() OVER (PARTITION BY channel ORDER BY ratio DESC) AS INT) AS rnk
          FROM g)
        SELECT channel, part_bucket,
          CAST(CAST(ROUND(ratio, 6) AS DECIMAL(18,6)) AS DOUBLE) AS ratio, rnk
        FROM r WHERE rnk <= 10
        ORDER BY channel, rnk, part_bucket""")),

    // q23: sales restricted to FREQUENT item buckets (HAVING over a
    // grouped fact) AND best customers (spend above half the max
    // single-customer spend — a scalar aggregate OF an aggregate,
    // broadcast against the customer rollup) — the two-semi-join +
    // broadcast-scalar shape.
    QueryDef(
      "tpcds_frequent_best_sales",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val li = Tables(s, dir, "lineitem")
        val fact = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(col("o_custkey").as("cust"),
            (col("l_partkey") % 100).as("bucket"),
            col("l_quantity"), col("l_extendedprice"))
        val frequent = fact.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 700)
          .select(col("bucket"))
        val spend = o.groupBy(col("o_custkey").as("cust"))
          .agg(lsum2(col("o_totalprice")).as("spend"))
        val maxSpend = spend.agg(max(col("spend")).as("max_spend"))
        val best = spend.crossJoin(broadcast(maxSpend))
          .filter(col("spend") > col("max_spend") * 0.5)
          .select(col("cust"))
        fact.join(broadcast(frequent), "bucket")
          .join(broadcast(best), "cust")
          .agg(count(lit(1)).as("n_sales"),
            lsum2(col("l_extendedprice")).cast(Num.D2).as("revenue"))
      },
      Some("""
        WITH fact AS (
          SELECT o.o_custkey AS cust, l.l_partkey % 100 AS bucket,
            l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        frequent AS (
          SELECT bucket FROM fact GROUP BY bucket HAVING COUNT(*) > 700),
        spend AS (
          SELECT o_custkey AS cust,
            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS spend
          FROM orders GROUP BY 1),
        best AS (
          SELECT cust FROM spend WHERE spend > (SELECT MAX(spend) FROM spend) * 0.5)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sales,
          CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
            AS DECIMAL(18,2)) AS revenue
        FROM fact
        WHERE fact.bucket IN (SELECT bucket FROM frequent)
          AND fact.cust IN (SELECT cust FROM best)""")),

    // q31: nations whose urgent-channel revenue share grew faster than
    // the regular channel across 1995 Q1→Q2 AND Q2→Q3 — six grouped
    // subqueries of the same fact joined on the nation.
    QueryDef(
      "tpcds_channel_share_growth",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val fact = o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .filter(year(col("o_orderdate")) === 1995 &&
            quarter(col("o_orderdate")) <= 3)
          .select(col("n_name"),
            quarter(col("o_orderdate")).as("q"),
            col("o_orderpriority").startsWith("1").as("urgent"),
            col("o_totalprice"))
        def chanQ(urgent: Boolean, q: Int) =
          fact.filter(col("urgent") === urgent && col("q") === q)
            .groupBy(col("n_name"))
            .agg(lsum2(col("o_totalprice")).as(s"rev_${if (urgent) "u" else "r"}$q"))
        val joined = chanQ(true, 1).join(chanQ(true, 2), "n_name")
          .join(chanQ(true, 3), "n_name")
          .join(chanQ(false, 1), "n_name")
          .join(chanQ(false, 2), "n_name")
          .join(chanQ(false, 3), "n_name")
        joined
          .filter(col("rev_u1") > 0 && col("rev_u2") > 0 &&
            col("rev_r1") > 0 && col("rev_r2") > 0)
          .filter(col("rev_u2") / col("rev_u1") > col("rev_r2") / col("rev_r1") &&
            col("rev_u3") / col("rev_u2") > col("rev_r3") / col("rev_r2"))
          .select(col("n_name"),
            round(col("rev_u2") / col("rev_u1"), 6).as("u_growth_12"),
            round(col("rev_r2") / col("rev_r1"), 6).as("r_growth_12"),
            round(col("rev_u3") / col("rev_u2"), 6).as("u_growth_23"),
            round(col("rev_r3") / col("rev_r2"), 6).as("r_growth_23"))
          .orderBy(col("n_name"))
      },
      Some("""
        WITH fact AS (
          SELECT n.n_name, QUARTER(o.o_orderdate) AS q,
            o.o_orderpriority LIKE '1%' AS urgent, o.o_totalprice
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE YEAR(o.o_orderdate) = 1995 AND QUARTER(o.o_orderdate) <= 3),
        g AS (
          SELECT n_name, q, urgent,
            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
          FROM fact GROUP BY 1, 2, 3),
        u1 AS (SELECT n_name, rev AS rev_u1 FROM g WHERE urgent AND q = 1),
        u2 AS (SELECT n_name, rev AS rev_u2 FROM g WHERE urgent AND q = 2),
        u3 AS (SELECT n_name, rev AS rev_u3 FROM g WHERE urgent AND q = 3),
        r1 AS (SELECT n_name, rev AS rev_r1 FROM g WHERE NOT urgent AND q = 1),
        r2 AS (SELECT n_name, rev AS rev_r2 FROM g WHERE NOT urgent AND q = 2),
        r3 AS (SELECT n_name, rev AS rev_r3 FROM g WHERE NOT urgent AND q = 3)
        SELECT n_name,
          ROUND(rev_u2 / rev_u1, 6) AS u_growth_12,
          ROUND(rev_r2 / rev_r1, 6) AS r_growth_12,
          ROUND(rev_u3 / rev_u2, 6) AS u_growth_23,
          ROUND(rev_r3 / rev_r2, 6) AS r_growth_23
        FROM u1 JOIN u2 USING (n_name) JOIN u3 USING (n_name)
          JOIN r1 USING (n_name) JOIN r2 USING (n_name) JOIN r3 USING (n_name)
        WHERE rev_u1 > 0 AND rev_u2 > 0 AND rev_r1 > 0 AND rev_r2 > 0
          AND rev_u2 / rev_u1 > rev_r2 / rev_r1
          AND rev_u3 / rev_u2 > rev_r3 / rev_r2
        ORDER BY n_name"""))
  )
}
