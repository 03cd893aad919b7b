package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Scan → filter → join → aggregate core, the reference's bread-and-butter
  * plan shapes (TableScan/Filter/Join/Aggregating steps,
  * /root/reference/src/QueryPlan/TableScanStep.h:34, JoinStep.h:67,
  * AggregatingStep.h:99), expressed as declarative DataFrame plans so
  * Catalyst chooses broadcast-vs-shuffle, pushes predicates into the
  * Parquet scan, and prunes columns.
  *
  * Scale notes: fact-fact joins (orders ⋈ lineitem) shuffle on the join
  * key; dimension joins (region/nation/customer/supplier/part) stay within
  * the auto-broadcast threshold even at 100 TB fact scale, so no shuffle is
  * introduced on the fact side for them.
  */
object RelationalCore {
  import Num._

  private def ts(s: String) = lit(Timestamp.valueOf(s))

  val defs: Seq[QueryDef] = Seq(
    // ---- TPC-H Q1: pricing summary (wide aggregate over the biggest fact) ----
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val charge = disc * (lit(1.0) + col("l_tax"))
        li.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // 2-decimal money columns take the cents-long fast path
            // (lsum2 ≡ dsum2 bit-for-bit, see Num); the 6-decimal
            // products stay on the overflow-safe decimal path.
            lsum2(col("l_quantity")).as("sum_qty"),
            lsum2(col("l_extendedprice")).as("sum_base_price"),
            dsum6(disc).as("sum_disc_price"),
            dsum6(charge).as("sum_charge"),
            lavg2(col("l_quantity")).as("avg_qty"),
            lavg2(col("l_extendedprice")).as("avg_price"),
            lavg2(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- TPC-H Q3: shipping priority (two fact joins + top-N) ----
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
        val l = Tables(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
        // r15 (guide §2.3/§3.1): apply the broadcast dimension filter to
        // orders BEFORE the fact-fact shuffle — the BUILDING segment keeps
        // ~1/5 of customers, so the orders side of the l⋈o exchange
        // shrinks ~5× (same rows out; Catalyst does not reorder joins
        // without CBO join-reorder, so the written order decides).
        l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10""")),

    // ---- TPC-H Q5-like: revenue by region/nation (6-way star join) ----
    QueryDef(
      "q5_region_revenue",
      (s, dir) => {
        val r = Tables(s, dir, "region")
        val n = Tables(s, dir, "nation")
        val c = Tables(s, dir, "customer")
        val sup = Tables(s, dir, "supplier")
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem")
        // r15: a pre-aggregation on (o_custkey, s_nationkey) before the
        // customer join was prototyped (guide §2.3) and REJECTED by
        // measurement — ABProf alternating A/B at sf0.1: 1.11 s → 2.01 s
        // median. The customer join broadcasts at every tested scale, so
        // the extra exchange bought nothing; at a scale where customer
        // must shuffle, AQE picks the join strategy and the pre-agg
        // should be revisited.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- TPC-H Q6: forecasting revenue change (pure pushdown filter + agg) ----
    QueryDef(
      "q6_forecast_revenue",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                  col("l_shipdate") < ts("1997-01-01 00:00:00") &&
                  col("l_discount").between(0.02, 0.06) &&
                  col("l_quantity") < 24)
          .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
               count(lit(1)).as("n_items")),
      Some("""
        SELECT
          CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24""")),

    // ---- TPC-H Q10-like: returned items by customer (top 20) ----
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        // r15 (guide §2.3 "aggregate before you shuffle"): sum revenue per
        // customer key BEFORE the customer join — c_custkey is customer's
        // key, so grouping by o_custkey yields the identical groups while
        // the customer-join input shrinks from every returned lineitem to
        // one row per buying customer (~6× fewer rows into that join's
        // exchange at scale; locally the dimension stays broadcast).
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // ---- Join kinds (reference kinds Inner/Left/Right/Full/Cross/Semi/Anti,
    //      /root/reference/src/Parsers/ASTTablesInSelectQuery.h:122-150) ----
    QueryDef(
      "join_left_outer",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_mktsegment"))
          .agg(countDistinct(col("c_custkey")).as("n_customers"),
               count(col("o_orderkey")).as("n_orders"),
               countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_without_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment,
          COUNT(DISTINCT c_custkey) AS n_customers,
          COUNT(o_orderkey) AS n_orders,
          COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_without_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    QueryDef(
      "join_right_outer",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        o.join(c, col("o_custkey") === col("c_custkey"), "right")
          .groupBy(col("c_nationkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
               countDistinct(col("c_custkey")).as("n_customers"))
          .orderBy(col("c_nationkey"))
      },
      Some("""
        SELECT c_nationkey, COUNT(o_orderkey) AS n_orders,
          COUNT(DISTINCT c_custkey) AS n_customers
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")),

    QueryDef(
      "join_full_outer",
      (s, dir) => {
        val c = Tables(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, Seq("nk"), "full")
          .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                  coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nk"))
      },
      Some("""
        SELECT COALESCE(c.nk, s.nk) AS nk,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
          USING (nk)
        ORDER BY nk""")),

    QueryDef(
      "join_semi",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val urgent = Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    QueryDef(
      "join_anti",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers_no_orders"))
          .orderBy(col("c_nationkey"))
      },
      Some("""
        SELECT c_nationkey, COUNT(*) AS n_customers_no_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")),

    QueryDef(
      "join_cross",
      (s, dir) => {
        val r1 = Tables(s, dir, "region").select(col("r_name").as("r1"))
        val r2 = Tables(s, dir, "region").select(col("r_name").as("r2"))
        r1.crossJoin(r2).filter(col("r1") < col("r2")).orderBy(col("r1"), col("r2"))
      },
      Some("""
        SELECT a.r_name AS r1, b.r_name AS r2
        FROM region a CROSS JOIN region b
        WHERE a.r_name < b.r_name
        ORDER BY r1, r2""")),

    // Non-equi join: bucket parts by size range against an inline dimension
    // (reference NestedLoopJoin, /root/reference/src/Interpreters/NestedLoopJoin.h:79).
    QueryDef(
      "join_nonequi_range",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        val buckets = s.createDataFrame(Seq(
          ("small", 0, 15), ("medium", 16, 30), ("large", 31, 60)))
          .toDF("bucket", "lo", "hi")
        p.join(broadcast(buckets),
            col("p_size") >= col("lo") && col("p_size") <= col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_parts"), dsum2(col("p_retailprice")).as("sum_price"))
          .orderBy(col("bucket"))
      },
      Some("""
        SELECT bucket, COUNT(*) AS n_parts,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part JOIN (VALUES ('small', 0, 15), ('medium', 16, 30), ('large', 31, 60))
          AS b(bucket, lo, hi) ON p_size >= lo AND p_size <= hi
        GROUP BY bucket
        ORDER BY bucket""")),

    // Equi join with non-equi residual condition.
    QueryDef(
      "join_residual_cond",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
                  col("l_shipdate") > col("o_orderdate"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_late_ship_items"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_late_ship_items
        FROM orders JOIN lineitem
          ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""))
  )
}
