package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 TPC-DS plan-shape corpus — mirrors the reference's golden-plan
  * gate breadth (/root/reference/tests/optimizers/tpcds/queries/, checked
  * by gtest_plan_check_tpcds1000.cpp) with ten more distinctive shapes on
  * the test schema, each also hash-checked against a DuckDB oracle and
  * snapshot-gated in GoldenPlanSpec.
  */
object TpcdsShapes2 {
  import Num._

  val defs: Seq[QueryDef] = Seq(

    // q71 shape: multi-channel UNION ALL of differently-filtered fact
    // scans, broadcast-joined to the item dim, aggregated per (brand,
    // channel).
    QueryDef(
      "tpcds_union_channels",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        def chan(f: org.apache.spark.sql.Column, name: String) =
          li.filter(f).select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
            lit(name).as("channel"))
        val u = chan(col("l_quantity") <= 15, "small")
          .unionAll(chan(col("l_quantity") > 15 && col("l_quantity") <= 35, "medium"))
          .unionAll(chan(col("l_quantity") > 35, "large"))
        u.join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("channel"))
          .agg(dsum6(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"), col("channel"))
      },
      Some("""
        WITH u AS (
          SELECT l_partkey, l_extendedprice * (1 - l_discount) AS rev, 'small' AS channel
          FROM lineitem WHERE l_quantity <= 15
          UNION ALL
          SELECT l_partkey, l_extendedprice * (1 - l_discount), 'medium'
          FROM lineitem WHERE l_quantity > 15 AND l_quantity <= 35
          UNION ALL
          SELECT l_partkey, l_extendedprice * (1 - l_discount), 'large'
          FROM lineitem WHERE l_quantity > 35)
        SELECT p_brand, channel,
          CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM u JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, channel
        ORDER BY p_brand, channel""")),

    // q5 shape: sales(+) and returns(−) branches unioned, dim chain
    // (supplier → nation → region) broadcast, ROLLUP over the geo
    // hierarchy.
    QueryDef(
      "tpcds_returns_net",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val sales = li.select(col("l_suppkey"), rev.as("gain"), lit(0.0).as("loss"))
        val returns = li.filter(col("l_returnflag") === "R")
          .select(col("l_suppkey"), lit(0.0).as("gain"), rev.as("loss"))
        sales.unionAll(returns)
          .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(dsum6(col("gain")).as("gross"), dsum6(col("loss")).as("returned"),
               dsum6(col("gain") - col("loss")).as("net"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some("""
        WITH u AS (
          SELECT l_suppkey, l_extendedprice * (1 - l_discount) AS gain, 0.0 AS loss
          FROM lineitem
          UNION ALL
          SELECT l_suppkey, 0.0, l_extendedprice * (1 - l_discount)
          FROM lineitem WHERE l_returnflag = 'R')
        SELECT r_name, n_name,
          CAST(SUM(CAST(gain AS DECIMAL(18,6))) AS DOUBLE) AS gross,
          CAST(SUM(CAST(loss AS DECIMAL(18,6))) AS DOUBLE) AS returned,
          CAST(SUM(CAST(gain - loss AS DECIMAL(18,6))) AS DOUBLE) AS net
        FROM u
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")),

    // q61 shape: ratio of two independent single-row aggregates over the
    // same fact (promotional vs total revenue), combined by cross join.
    QueryDef(
      "tpcds_promo_ratio",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val promo = li.filter(col("l_discount") >= 0.05)
          .agg(dsum6(rev).as("promo_rev"))
        val total = li.agg(dsum6(rev).as("total_rev"))
        promo.crossJoin(total)
          .select(col("promo_rev"), col("total_rev"),
            round(col("promo_rev") / col("total_rev"), 6).as("promo_share"))
      },
      Some("""
        SELECT promo_rev, total_rev, ROUND(promo_rev / total_rev, 6) AS promo_share
        FROM (SELECT
          CAST(SUM(CAST(CASE WHEN l_discount >= 0.05
            THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(18,6))) AS DOUBLE)
            AS promo_rev,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
            AS total_rev
        FROM lineitem) t""")),

    // q75 shape: period-over-period comparison — monthly order revenue
    // self-joined to the previous month, reporting the delta ratio.
    QueryDef(
      "tpcds_mom_growth",
      (s, dir) => {
        val m = Tables(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(dsum2(col("o_totalprice")).as("rev"))
        val prev = m.select(add_months(col("m"), 1).cast("timestamp").as("m"),
          col("rev").as("prev_rev"))
        m.join(prev, Seq("m"))
          .select(col("m"), col("rev"), col("prev_rev"),
            round((col("rev") - col("prev_rev")) / col("prev_rev"), 6).as("growth"))
          .orderBy(col("m"))
      },
      Some("""
        WITH m AS (
          SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1)
        SELECT cur.m AS m, cur.rev AS rev, prev.rev AS prev_rev,
          ROUND((cur.rev - prev.rev) / prev.rev, 6) AS growth
        FROM m cur JOIN m prev
          ON cur.m = CAST(prev.m + INTERVAL 1 MONTH AS TIMESTAMP)
        ORDER BY m""")),

    // q10 shape: dimension counts of customers qualified by an EXISTS and
    // a NOT EXISTS on the fact — semi join + anti join + broadcast dim.
    QueryDef(
      "tpcds_exists_pair",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val f = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val p = orders.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("pc"))
        Tables(s, dir, "customer")
          .join(f, col("c_custkey") === f("o_custkey"), "left_semi")
          .join(p, col("c_custkey") === p("pc"), "left_anti")
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
               dsum2(col("c_acctbal")).as("sum_acctbal"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY n_name
        ORDER BY n_name""")),

    // q44 shape: best/worst performers — rank an aggregate both ways,
    // take both extremes, union, join back to the item dim.
    QueryDef(
      "tpcds_best_worst",
      (s, dir) => {
        val avgQ = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg((dsum6(col("l_quantity")) / count(lit(1))).as("avg_q"))
        val wAsc = Window.orderBy(col("avg_q").asc, col("l_partkey").asc)
        val wDesc = Window.orderBy(col("avg_q").desc, col("l_partkey").desc)
        val ranked = avgQ
          .withColumn("rk_worst", row_number().over(wAsc))
          .withColumn("rk_best", row_number().over(wDesc))
        val best = ranked.filter(col("rk_best") <= 5)
          .select(lit("best").as("side"), col("rk_best").as("rk"),
            col("l_partkey"), col("avg_q"))
        val worst = ranked.filter(col("rk_worst") <= 5)
          .select(lit("worst").as("side"), col("rk_worst").as("rk"),
            col("l_partkey"), col("avg_q"))
        best.unionAll(worst)
          .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .select(col("side"), col("rk"), col("p_name"),
            round(col("avg_q"), 6).as("avg_q"))
          .orderBy(col("side"), col("rk"))
      },
      Some("""
        WITH a AS (
          SELECT l_partkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_q
          FROM lineitem GROUP BY l_partkey),
        r AS (
          SELECT l_partkey, avg_q,
            ROW_NUMBER() OVER (ORDER BY avg_q ASC, l_partkey ASC) AS rk_worst,
            ROW_NUMBER() OVER (ORDER BY avg_q DESC, l_partkey DESC) AS rk_best
          FROM a),
        u AS (
          SELECT 'best' AS side, rk_best AS rk, l_partkey, avg_q FROM r WHERE rk_best <= 5
          UNION ALL
          SELECT 'worst', rk_worst, l_partkey, avg_q FROM r WHERE rk_worst <= 5)
        SELECT side, rk, p_name, ROUND(avg_q, 6) AS avg_q
        FROM u JOIN part ON l_partkey = p_partkey
        ORDER BY side, rk""")),

    // q34 shape: two-level aggregation — orders per customer, then the
    // histogram of those counts.
    QueryDef(
      "tpcds_two_level_agg",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("n_orders")),
      Some("""
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
        GROUP BY n_orders
        ORDER BY n_orders""")),

    // q38 shape: INTERSECT chain — customers active in each of three
    // first-quarters, counted. Catalyst lowers each INTERSECT to a
    // distinct + left-semi join.
    QueryDef(
      "tpcds_intersect_periods",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        def q1(year: Int) = orders
          .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
            col("o_orderdate") < lit(s"$year-04-01"))
          .select(col("o_custkey"))
        q1(1995).intersect(q1(1996)).intersect(q1(1997))
          .agg(count(lit(1)).as("n_loyal_customers"))
      },
      Some("""
        SELECT COUNT(*) AS n_loyal_customers FROM (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
          INTERSECT
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
          INTERSECT
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01') t""")),

    // q47 shape: monthly series per brand with window lag and
    // partition-average deviation filter.
    QueryDef(
      "tpcds_brand_monthly_dev",
      (s, dir) => {
        val m = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), date_trunc("month", col("l_shipdate")).as("m"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val wB = Window.partitionBy(col("p_brand"))
        val wSeq = Window.partitionBy(col("p_brand")).orderBy(col("m"))
        // decimal avg: order-independent across the partition (Num rule)
        m.withColumn("brand_avg", avg(col("rev").cast(D6)).over(wB).cast("double"))
          .withColumn("prev_rev", lag(col("rev"), 1).over(wSeq))
          .filter(col("rev") > col("brand_avg") * 1.4)
          .select(col("p_brand"), col("m"), round(col("rev"), 4).as("rev"),
            round(col("brand_avg"), 4).as("brand_avg"),
            round(col("prev_rev"), 4).as("prev_rev"))
          .orderBy(col("p_brand"), col("m"))
      },
      Some("""
        WITH m AS (
          SELECT p_brand, CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS m,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
              AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        w AS (
          SELECT p_brand, m, rev,
            AVG(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY p_brand) AS brand_avg,
            LAG(rev) OVER (PARTITION BY p_brand ORDER BY m) AS prev_rev
          FROM m)
        SELECT p_brand, m, ROUND(rev, 4) AS rev, ROUND(brand_avg, 4) AS brand_avg,
          ROUND(prev_rev, 4) AS prev_rev
        FROM w WHERE rev > brand_avg * 1.4
        ORDER BY p_brand, m""")),

    // q90 shape: am/pm activity ratio — one scan, two conditional
    // aggregates per group, scalar ratio (events table carries the hour
    // dimension).
    QueryDef(
      "tpcds_ampm_ratio",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(when(hour(col("ts")) < 12, 1)).as("am_cnt"),
               count(when(hour(col("ts")) >= 12, 1)).as("pm_cnt"))
          .select(col("event_type"), col("am_cnt"), col("pm_cnt"),
            round(col("am_cnt").cast("double") / col("pm_cnt"), 6).as("am_pm_ratio"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
          COUNT(CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 1 END) AS am_cnt,
          COUNT(CASE WHEN EXTRACT(hour FROM ts) >= 12 THEN 1 END) AS pm_cnt,
          ROUND(CAST(COUNT(CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 1 END) AS DOUBLE)
            / COUNT(CASE WHEN EXTRACT(hour FROM ts) >= 12 THEN 1 END), 6) AS am_pm_ratio
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // q34 shape: per-customer order counts banded by HAVING, joined back
    // to the customer dim, distribution per market segment — aggregate →
    // HAVING filter → broadcast dim join → re-aggregate.
    QueryDef(
      "tpcds_having_band",
      (s, dir) => {
        val freq = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 8 && col("n_orders") <= 12)
        freq.join(broadcast(Tables(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
               sum(col("n_orders")).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        WITH freq AS (
          SELECT o_custkey, COUNT(*) AS n
          FROM orders
          GROUP BY o_custkey
          HAVING COUNT(*) BETWEEN 8 AND 12)
        SELECT c_mktsegment, COUNT(*) AS n_customers,
          CAST(SUM(n) AS BIGINT) AS n_orders
        FROM freq JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // q58 shape: the same measure aggregated over two disjoint periods,
    // equi-joined per key, kept only where each side lands inside a
    // tolerance band of their joint average — two scans of one fact
    // table, join on the group key, ratio residual predicates.
    QueryDef(
      "tpcds_tolerance_compare",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        def period(f: org.apache.spark.sql.Column, alias: String) =
          li.filter(f).groupBy(col("l_partkey").as(s"${alias}_key"))
            .agg(dsum2(col("l_extendedprice")).as(s"${alias}_rev"))
        val h1 = period(col("l_shipdate") < "1994-07-01", "h1")
        val h2 = period(col("l_shipdate") >= "1994-07-01", "h2")
        h1.join(h2, col("h1_key") === col("h2_key"))
          .withColumn("avg_rev", (col("h1_rev") + col("h2_rev")) / 2)
          .filter(col("h1_rev").between(col("avg_rev") * 0.9, col("avg_rev") * 1.1) &&
                  col("h2_rev").between(col("avg_rev") * 0.9, col("avg_rev") * 1.1))
          .select(col("h1_key").as("l_partkey"),
                  round(col("h1_rev"), 2).as("h1_rev"),
                  round(col("h2_rev"), 2).as("h2_rev"))
          .orderBy(col("l_partkey"))
      },
      Some("""
        WITH h1 AS (
          SELECT l_partkey AS k,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM lineitem WHERE l_shipdate < DATE '1994-07-01'
          GROUP BY l_partkey),
        h2 AS (
          SELECT l_partkey AS k,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM lineitem WHERE l_shipdate >= DATE '1994-07-01'
          GROUP BY l_partkey)
        SELECT h1.k AS l_partkey,
          ROUND(h1.rev, 2) AS h1_rev, ROUND(h2.rev, 2) AS h2_rev
        FROM h1 JOIN h2 ON h1.k = h2.k
        WHERE h1.rev BETWEEN 0.9 * (h1.rev + h2.rev) / 2 AND 1.1 * (h1.rev + h2.rev) / 2
          AND h2.rev BETWEEN 0.9 * (h1.rev + h2.rev) / 2 AND 1.1 * (h1.rev + h2.rev) / 2
        ORDER BY l_partkey"""))
  )
}
