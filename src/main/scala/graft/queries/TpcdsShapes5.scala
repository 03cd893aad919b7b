package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Fifth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/src/Optimizer/tests/gtest_plan_check_tpcds1000.cpp):
  * q92/q32's correlated scalar-of-aggregate discount threshold, q39's
  * coefficient-of-variation consecutive-period self-join, and q21's
  * before/after pivot split.
  *
  * Scale notes: every per-group aggregate here is small relative to the
  * fact table (parts/suppliers), so the join-back sides broadcast; the
  * q39 self-join keys on (supplier, month) after aggregation — a
  * cardinality-bounded equi-join, never fact×fact. Stddev is derived
  * from exact decimal (n, Σx, Σx²) sums so the value is
  * order-independent (the Num rule) — raw stddev over doubles would
  * flake the driver hash.
  */
object TpcdsShapes5 {
  import Num._

  val defs: Seq[QueryDef] = Seq(

    // q92/q32 shape: "excess discount" — revenue from rows whose
    // discount exceeds 1.3× their part's average discount. The per-part
    // average is a separate aggregate broadcast back onto the fact scan
    // (the correlated-scalar decorrelation TPC-DS forces).
    QueryDef(
      "tpcds_excess_discount",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // avg as exact-decimal sum / count: Spark's and DuckDB's AVG
        // lower differently over decimals; the explicit division is the
        // same IEEE op on identical operands in both engines.
        val partAvg = li.groupBy(col("l_partkey").as("pk"))
          .agg((dsum6(col("l_discount")) / count(lit(1))).as("avg_disc"))
        val p = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))
        li.join(broadcast(partAvg), col("l_partkey") === col("pk"))
          .filter(col("l_discount") > col("avg_disc") * 1.3)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(dsum2(col("l_extendedprice")).as("excess_revenue"),
            count(lit(1)).as("n_rows"))
          .select(col("p_brand"), round(col("excess_revenue"), 2).as("excess_revenue"),
            col("n_rows"))
          .orderBy(col("p_brand"))
      },
      Some("""
        WITH pa AS (
          SELECT l_partkey AS pk,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc
          FROM lineitem GROUP BY 1)
        SELECT p_brand,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
            AS excess_revenue,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        JOIN pa ON pk = l_partkey
        JOIN part ON p_partkey = l_partkey
        WHERE l_discount > avg_disc * 1.3
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // q39 shape: per (supplier, month) quantity coefficient of variation
    // from exact decimal moments, then a self-join of CONSECUTIVE months
    // comparing the two covs — the inventory-variance pair pattern.
    QueryDef(
      "tpcds_cov_consecutive",
      (s, dir) => {
        val m = Tables(s, dir, "lineitem")
          .groupBy(col("l_suppkey"),
            date_trunc("month", col("l_shipdate")).as("m"))
          .agg(count(lit(1)).as("n"),
            dsum6(col("l_quantity")).as("sx"),
            dsum6(col("l_quantity") * col("l_quantity")).as("sx2"))
          .filter(col("n") > 1)
          .withColumn("mean", col("sx") / col("n"))
          .withColumn("cov",
            sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
              / col("mean"))
        val m1 = m.select(col("l_suppkey").as("sk"), col("m").as("m1"),
          col("cov").as("cov1"))
        val m2 = m.select(col("l_suppkey").as("sk2"), col("m").as("m2"),
          col("cov").as("cov2"))
        m1.join(m2, col("sk") === col("sk2") &&
            col("m2") === add_months(col("m1"), 1))
          .filter(col("cov1") > col("cov2"))
          .select(col("sk").as("suppkey"), col("m1"),
            round(col("cov1"), 6).as("cov1"), round(col("cov2"), 6).as("cov2"))
          .orderBy(col("suppkey"), col("m1"))
      },
      Some("""
        WITH m AS (
          SELECT l_suppkey AS sk, CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS m,
            COUNT(*) AS n,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx2
          FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1),
        c AS (
          SELECT sk, m,
            SQRT((sx2 - sx * sx / n) / (n - 1)) / (sx / n) AS cov
          FROM m)
        SELECT a.sk AS suppkey, a.m AS m1,
          ROUND(a.cov, 6) AS cov1, ROUND(b.cov, 6) AS cov2
        FROM c a JOIN c b
          ON a.sk = b.sk AND b.m = a.m + INTERVAL 1 MONTH
        WHERE a.cov > b.cov
        ORDER BY suppkey, m1""")),

    // q21 shape: per-supplier quantity split around a pivot date, kept
    // when the before/after ratio stays within [2/3, 3/2] — the
    // inventory before/after band.
    QueryDef(
      "tpcds_before_after",
      (s, dir) => {
        val pivot = lit("1998-06-01").cast("date")
        Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(
            dsum2(when(col("l_shipdate") < pivot, col("l_quantity"))
              .otherwise(lit(0))).as("before_qty"),
            dsum2(when(col("l_shipdate") >= pivot, col("l_quantity"))
              .otherwise(lit(0))).as("after_qty"))
          .filter(col("after_qty") > 0 &&
            col("before_qty") / col("after_qty") >= 2.0 / 3.0 &&
            col("before_qty") / col("after_qty") <= 3.0 / 2.0)
          .select(col("s_name"), round(col("before_qty"), 2).as("before_qty"),
            round(col("after_qty"), 2).as("after_qty"))
          .orderBy(col("s_name"))
      },
      Some("""
        WITH a AS (
          SELECT s_name,
            CAST(SUM(CAST(CASE WHEN l_shipdate < DATE '1998-06-01'
              THEN l_quantity ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS before_qty,
            CAST(SUM(CAST(CASE WHEN l_shipdate >= DATE '1998-06-01'
              THEN l_quantity ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS after_qty
          FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          GROUP BY s_name)
        SELECT s_name, ROUND(before_qty, 2) AS before_qty,
          ROUND(after_qty, 2) AS after_qty
        FROM a
        WHERE after_qty > 0
          AND before_qty / after_qty >= 2.0/3.0
          AND before_qty / after_qty <= 3.0/2.0
        ORDER BY s_name"""))
  )
}
