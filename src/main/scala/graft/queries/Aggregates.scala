package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Aggregation surface beyond plain GROUP BY: multi-grouping
  * (GROUPING SETS / ROLLUP / CUBE — reference CubeStep/RollupStep,
  * /root/reference/src/QueryPlan/CubeStep.h:28, RollupStep.h:27,
  * GroupingSetsParams at AggregatingStep.h:37), multi-DISTINCT
  * aggregation, statistics aggregates, quantiles, argMin/argMax
  * (/root/reference/src/AggregateFunctions/AggregateFunctionMinMaxAny.cpp)
  * and ordered string concatenation (groupArray-style,
  * /root/reference/src/AggregateFunctions/AggregateFunctionGroupArray.cpp).
  *
  * All multi-grouping shapes lower to Spark's native Expand node — a single
  * shuffle regardless of grouping-set count, which is the scale-correct plan.
  */
object Aggregates {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "agg_rollup",
      (s, dir) =>
        // r15 (guide §2.3 "aggregate before you shuffle"): rollup Expands
        // every INPUT row once per grouping set (3× here) before the
        // partial aggregate. Aggregating the base (status, priority)
        // cells first — count and an exact decimal partial sum — then
        // rolling up over the ~30 cells keeps the input single-pass; the
        // Expand now triples only the cell table. grouping() still
        // distinguishes data-NULL from subtotal-NULL on the cell table,
        // and summing decimal partials re-aggregates exactly (the double
        // cast stays at the end), so results are bit-identical.
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("__n"),
               sum(col("o_totalprice").cast(Num.D2)).as("__sum"))
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(sum(col("__n")).as("n_orders"),
               sum(col("__sum")).cast("double").as("sum_price"),
               grouping(col("o_orderstatus")).cast("int").as("g_status"),
               grouping(col("o_orderpriority")).cast("int").as("g_priority"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
          CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    QueryDef(
      "agg_cube",
      (s, dir) =>
        Tables(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
               davg2(col("o_totalprice")).as("avg_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // Arbitrary grouping sets through the engine's SQL front door.
    QueryDef(
      "agg_grouping_sets",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Several DISTINCT aggregates in one pass (reference rewrites these via
    // Expand/MarkDistinct — /root/reference/src/QueryPlan/MarkDistinctStep.h:13;
    // Spark's RewriteDistinctAggregates does the same).
    QueryDef(
      "agg_multi_distinct",
      (s, dir) =>
        Tables(s, dir, "orders")
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
               countDistinct(col("o_orderpriority")).as("n_priorities"),
               countDistinct(col("o_orderstatus"), col("o_orderpriority")).as("n_status_prio"),
               count(lit(1)).as("n_orders")),
      Some("""
        SELECT COUNT(DISTINCT o_custkey) AS n_customers,
          COUNT(DISTINCT o_orderpriority) AS n_priorities,
          COUNT(DISTINCT (o_orderstatus, o_orderpriority)) AS n_status_prio,
          COUNT(*) AS n_orders
        FROM orders""")),

    QueryDef(
      "select_distinct",
      (s, dir) =>
        Tables(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_nationkey"))
          .distinct()
          .orderBy(col("c_mktsegment"), col("c_nationkey")),
      Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // Statistics aggregates (AggregateFunctionStatistics*.cpp family).
    QueryDef(
      "agg_statistics",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
               round(stddev_samp(col("l_quantity")), 6).as("stddev_qty"),
               round(var_samp(col("l_quantity")), 6).as("var_qty"),
               round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
          ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
          ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_qty,
          ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
          ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // Exact quantiles with linear interpolation (reference quantile family,
    // /root/reference/src/AggregateFunctions/AggregateFunctionQuantile.h:66).
    QueryDef(
      "agg_quantiles",
      (s, dir) => {
        import graft.operators.Quantiles
        val li = Tables(s, dir, "lineitem")
        val q = Quantiles.percentiles(li, "l_linestatus", "l_quantity",
          Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75"))
        // High-cardinality continuous column → two-phase selection (no
        // full sort; constant-size shuffles).
        val pr = Quantiles.percentilesSelect(li, "l_linestatus", "l_extendedprice",
          bucketWidth = 1000.0, Seq(0.9 -> "pr90"))
        q.join(pr, "l_linestatus")
          .select(col("l_linestatus"),
            round(col("q25"), 6).as("p25"), round(col("q50"), 6).as("p50"),
            round(col("q75"), 6).as("p75"), round(col("pr90"), 6).as("price_p90"))
          .orderBy(col("l_linestatus"))
      },
      Some("""
        SELECT l_linestatus,
          ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS p25,
          ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50,
          ROUND(QUANTILE_CONT(l_quantity, 0.75), 6) AS p75,
          ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS price_p90
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    // argMax by a composite (value, key) — deterministic under value ties.
    QueryDef(
      "agg_argmax",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("max_order"),
               min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"),
               max(col("o_totalprice")).as("max_price"),
               min(col("o_totalprice")).as("min_price"))
          .orderBy(col("o_orderstatus")),
      Some("""
        WITH t AS (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
          FROM orders)
        SELECT o_orderstatus,
          MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS max_order,
          MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS min_order,
          MAX(o_totalprice) AS max_price,
          MIN(o_totalprice) AS min_price
        FROM t
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // groupArray-style ordered collection, exposed as a stable string.
    QueryDef(
      "agg_collect_ordered",
      (s, dir) => {
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
               count(lit(1)).as("n_nations"))
          .orderBy(col("r_name"))
      },
      Some("""
        SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
          COUNT(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // Conditional aggregation (reference -If combinator,
    // /root/reference/src/AggregateFunctions/AggregateFunctionIf.cpp).
    QueryDef(
      "agg_conditional",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .withColumn("l_shipmode_bucket", col("l_linenumber") % 3)
          .groupBy(col("l_shipmode_bucket"))
          .agg(count(lit(1)).as("n_items"),
               sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
               dsum2(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(lit(0.0))).as("returned_price"),
               count(when(col("l_quantity") > 40, 1)).as("n_bulk"))
          .orderBy(col("l_shipmode_bucket")),
      Some("""
        SELECT (l_linenumber % 3) AS l_shipmode_bucket, COUNT(*) AS n_items,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
          CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END
            AS DECIMAL(18,2))) AS DOUBLE) AS returned_price,
          COUNT(CASE WHEN l_quantity > 40 THEN 1 END) AS n_bulk
        FROM lineitem
        GROUP BY 1
        ORDER BY 1""")),

    QueryDef(
      "agg_having",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 5)
          .orderBy(col("spend").desc, col("o_custkey"))
          .limit(25),
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 5
        ORDER BY spend DESC, o_custkey
        LIMIT 25"""))
  )
}
