package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS-shaped plan patterns (the reference's second optimizer
  * golden-plan corpus, /root/reference/tests/optimizers/tpcds/ — 100
  * queries) re-expressed on the test schema. Each exercises a distinctive
  * plan shape rather than a literal port: q88's battery of independent
  * scalar-count subqueries, q36's rollup + rank-within-grouping-level,
  * q51's two cumulative series compared on a full outer join.
  */
object TpcdsShapes {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    // q88 shape: one row of independent conditional-count scalar
    // subqueries — Catalyst plans each as its own aggregate and joins the
    // singleton results.
    QueryDef(
      "tpcds_multi_count_scalars",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS q1_10,
            (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS q11_20,
            (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS q21_30,
            (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS q31_40,
            (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS q41_50,
            (SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R') AS returned,
            (SELECT COUNT(*) FROM lineitem WHERE l_discount >= 0.05) AS discounted,
            (SELECT COUNT(*) FROM lineitem WHERE l_tax = 0.0) AS untaxed""")
      },
      Some("""
        SELECT
          (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS q1_10,
          (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS q11_20,
          (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS q21_30,
          (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS q31_40,
          (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS q41_50,
          (SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R') AS returned,
          (SELECT COUNT(*) FROM lineitem WHERE l_discount >= 0.05) AS discounted,
          (SELECT COUNT(*) FROM lineitem WHERE l_tax = 0.0) AS untaxed""")),

    // q36 shape: ROLLUP revenue hierarchy + rank within each grouping
    // level (window partitioned by grouping_id).
    QueryDef(
      "tpcds_rollup_rank",
      (s, dir) => {
        val g = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .rollup(col("p_type"), col("p_brand"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               grouping_id().as("lvl"))
        val w = Window.partitionBy(col("lvl")).orderBy(col("revenue").desc,
          col("p_type").asc_nulls_first, col("p_brand").asc_nulls_first)
        g.withColumn("rank_in_level", rank().over(w))
          .filter(col("rank_in_level") <= 5)
          .select(col("lvl"), col("rank_in_level"), col("p_type"), col("p_brand"),
                  col("revenue"))
          .orderBy(col("lvl"), col("rank_in_level"))
      },
      Some("""
        WITH g AS (
          SELECT p_type, p_brand,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
              AS revenue,
            CASE WHEN p_type IS NULL AND p_brand IS NULL THEN 3
                 WHEN p_brand IS NULL THEN 1 ELSE 0 END AS lvl
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY ROLLUP (p_type, p_brand)),
        r AS (
          SELECT lvl, p_type, p_brand, revenue,
            RANK() OVER (PARTITION BY lvl ORDER BY revenue DESC,
              p_type ASC NULLS FIRST, p_brand ASC NULLS FIRST) AS rank_in_level
          FROM g)
        SELECT lvl, rank_in_level, p_type, p_brand, revenue
        FROM r WHERE rank_in_level <= 5
        ORDER BY lvl, rank_in_level""")),

    // q51 shape: two daily cumulative series (orders vs shipments) full
    // outer joined on the day axis, keeping months where the running
    // shipment count exceeds 3x the running order count.
    QueryDef(
      "tpcds_cumulative_compare",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n_ord"))
        val l = Tables(s, dir, "lineitem")
          .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
          .agg(count(lit(1)).as("n_ship"))
        val joined = o.join(l, Seq("m"), "full_outer")
        val w = Window.orderBy(col("m")).rowsBetween(Window.unboundedPreceding, 0)
        joined
          .withColumn("cum_ord", sum(coalesce(col("n_ord"), lit(0L))).over(w))
          .withColumn("cum_ship", sum(coalesce(col("n_ship"), lit(0L))).over(w))
          .filter(col("cum_ship") > col("cum_ord") * 3)
          .select(col("m"), col("cum_ord"), col("cum_ship"))
          .orderBy(col("m"))
      },
      Some("""
        WITH o AS (
          SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m,
            COUNT(*) AS n_ord
          FROM orders GROUP BY 1),
        l AS (
          SELECT CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS m,
            COUNT(*) AS n_ship
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT COALESCE(o.m, l.m) AS m, n_ord, n_ship
          FROM o FULL OUTER JOIN l ON o.m = l.m),
        c AS (
          SELECT m,
            SUM(COALESCE(n_ord, 0)) OVER (ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ord,
            SUM(COALESCE(n_ship, 0)) OVER (ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ship
          FROM j)
        SELECT m, CAST(cum_ord AS BIGINT) AS cum_ord,
          CAST(cum_ship AS BIGINT) AS cum_ship
        FROM c WHERE cum_ship > cum_ord * 3
        ORDER BY m"""))
  )
}
