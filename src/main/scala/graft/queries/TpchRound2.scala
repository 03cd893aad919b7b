package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Remaining TPC-H-shaped plans (Q8, Q9, Q13, Q15, Q17, Q21 analogues)
  * adapted to the test schema — completes coverage of the reference's
  * optimizer golden-plan corpus (/root/reference/tests/optimizers/tpch/,
  * 22 queries). The schema has no partsupp/commitdate/receiptdate/comment
  * columns, so those predicates are re-expressed on available columns
  * while keeping the original plan shape (market-share ratio over a
  * 6-table join, profit aggregation, outer-join histogram, view + scalar
  * max, correlated avg threshold, double-EXISTS/NOT-EXISTS pipeline).
  */
object TpchRound2 {
  import Num._

  private def ts(s: String) = lit(Timestamp.valueOf(s))

  private val q15Sql = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  private val q17Sql = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  private val q21Sql = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10"""

  val defs: Seq[QueryDef] = Seq(
    // Q8: market share of one supplier nation within the ASIA-customer
    // market for LARGE parts, by order year. Dimension joins broadcast;
    // the fact only shuffles for the final year aggregation.
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        val asiaNations = Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
                col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))
        val suppNation = Tables(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val p = Tables(s, dir, "part").filter(col("p_type") === "LARGE")
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                  col("o_orderdate") < ts("1998-01-01 00:00:00"))
        Tables(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
          .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((dsum6(when(col("supp_nation") === "NATION_7", col("volume")).otherwise(lit(0.0))) /
                dsum6(col("volume"))).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""
        SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
          CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_7'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) /
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
            AS mkt_share
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'LARGE' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
        ORDER BY o_year""")),

    // Q9: product profit by supplier nation and year. No partsupp in the
    // schema, so supply cost := 0.1 * p_retailprice * l_quantity.
    QueryDef(
      "q9_product_profit",
      (s, dir) => {
        val suppNation = Tables(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
        val p = Tables(s, dir, "part").filter(col("p_name").contains("widget"))
        Tables(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .withColumn("amount",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
              lit(0.1) * col("p_retailprice") * col("l_quantity"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(dsum6(col("amount")).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""
        SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
              - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC""")),

    // Q13: customer order-count distribution (outer join with a residual
    // condition, then a histogram of the per-customer counts).
    QueryDef(
      "q13_customer_distribution",
      (s, dir) => {
        val o = Tables(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        Tables(s, dir, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    // Q15: top supplier by 3-month revenue — CTE revenue view + scalar
    // MAX subquery (EnforceSingleRow, SURVEY §2.2).
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        Seq("supplier", "lineitem").foreach(t =>
          Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(q15Sql)
      },
      Some(q15Sql)),

    // Q17: small-quantity-order revenue — correlated per-part average
    // quantity threshold. The threshold average is computed as exact
    // decimal sum / count so both engines compare against the identical
    // double.
    QueryDef(
      "q17_small_qty_revenue",
      (s, dir) => {
        Seq("part", "lineitem").foreach(t =>
          Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(q17Sql)
      },
      Some(q17Sql)),

    // Q21: suppliers who kept orders waiting — EXISTS (another supplier
    // contributed) + NOT EXISTS (no other supplier was late). "Late" is
    // re-expressed as shipping >60 days after the order date since the
    // schema has no commit/receipt dates.
    QueryDef(
      "q21_waiting_suppliers",
      (s, dir) => {
        Seq("supplier", "lineitem", "orders").foreach(t =>
          Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(q21Sql)
      },
      Some(q21Sql))
  )

}
