package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Third TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/src/Optimizer/tests/gtest_plan_check_tpcds1000.cpp):
  * three more optimizer-distinctive shapes on the test schema —
  *
  *  - q11/q74 flavor: per-entity yearly aggregates SELF-JOINED across
  *    consecutive years with a growth-ratio filter (two grouped children
  *    of one join, ratio predicate after the join);
  *  - q78 flavor: returns excluded by ANTI-join before aggregation,
  *    kept/total ratio from two aggregates of the same fact;
  *  - q54 flavor: first-purchase anchor per customer (min-date
  *    aggregate) joined back with a bounded date-range residual, revenue
  *    windowed to the 90 days after the anchor.
  */
object TpcdsShapes3 {
  import Num._

  val defs: Seq[QueryDef] = Seq(

    // q11/q74: customers whose spend grew >25% year-over-year, any
    // consecutive year pair.
    QueryDef(
      "tpcds_yoy_customer_growth",
      (s, dir) => {
        val yearly = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
          .agg(dsum2(col("o_totalprice")).as("spend"))
        val next = yearly.select(col("o_custkey"), (col("y") - 1).as("y"),
          col("spend").as("next_spend"))
        yearly.join(next, Seq("o_custkey", "y"))
          .filter(col("next_spend") > col("spend") * 1.25)
          .select(col("o_custkey"), col("y"),
            round(col("spend"), 2).as("spend"),
            round(col("next_spend"), 2).as("next_spend"),
            round(col("next_spend") / col("spend"), 6).as("ratio"))
          .orderBy(desc("ratio"), col("o_custkey"), col("y"))
          .limit(50)
      },
      Some("""
        WITH yearly AS (
          SELECT o_custkey, YEAR(o_orderdate) AS y,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY 1, 2)
        SELECT a.o_custkey, a.y,
          ROUND(a.spend, 2) AS spend,
          ROUND(b.spend, 2) AS next_spend,
          ROUND(b.spend / a.spend, 6) AS ratio
        FROM yearly a JOIN yearly b
          ON a.o_custkey = b.o_custkey AND b.y = a.y + 1
        WHERE b.spend > a.spend * 1.25
        ORDER BY ratio DESC, a.o_custkey, a.y
        LIMIT 50""")),

    // q78: per part-year lineitem quantity with returns ANTI-joined out,
    // against the all-rows total — the kept ratio.
    QueryDef(
      "tpcds_returns_kept_ratio",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate")).as("y"))
        val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        val returned = joined.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("rk"), col("l_linenumber").as("rn"))
        val kept = joined.join(returned,
            joined("l_orderkey") === returned("rk") &&
              joined("l_linenumber") === returned("rn"),
            "left_anti")
          .groupBy(col("y"))
          .agg(sum(col("l_quantity").cast("long")).as("kept_qty"))
        val total = joined.groupBy(col("y"))
          .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        kept.join(total, Seq("y"))
          .select(col("y"), col("kept_qty"), col("total_qty"),
            round(col("kept_qty").cast("double") / col("total_qty"), 6).as("kept_ratio"))
          .orderBy(col("y"))
      },
      Some("""
        WITH joined AS (
          SELECT l.*, YEAR(o.o_orderdate) AS y
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        kept AS (
          SELECT y, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS kept_qty
          FROM joined j
          WHERE NOT EXISTS (
            SELECT 1 FROM joined r
            WHERE r.l_returnflag = 'R' AND r.l_orderkey = j.l_orderkey
              AND r.l_linenumber = j.l_linenumber)
          GROUP BY y),
        total AS (
          SELECT y, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM joined GROUP BY y)
        SELECT y, kept_qty, total_qty,
          ROUND(CAST(kept_qty AS DOUBLE) / total_qty, 6) AS kept_ratio
        FROM kept JOIN total USING (y)
        ORDER BY y""")),

    // q54: revenue inside the 90 days after each customer's FIRST order
    // — min-date anchor aggregate joined back with a range residual.
    QueryDef(
      "tpcds_first_purchase_window",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val anchor = o.groupBy(col("o_custkey").as("ck"))
          .agg(min(col("o_orderdate")).as("first_d"))
        o.join(anchor, o("o_custkey") === anchor("ck") &&
            o("o_orderdate") >= anchor("first_d") &&
            o("o_orderdate") <= date_add(anchor("first_d"), 90))
          .groupBy(col("o_custkey"))
          .agg(dsum2(col("o_totalprice")).as("window_rev"),
            count(lit(1)).as("n_orders"))
          .agg(round(davg6(col("window_rev")), 4).as("avg_window_rev"),
            round(davg6(col("n_orders").cast("double")), 6).as("avg_window_orders"),
            count(lit(1)).as("n_customers"))
      },
      Some("""
        WITH anchor AS (
          SELECT o_custkey AS ck, MIN(o_orderdate) AS first_d
          FROM orders GROUP BY o_custkey),
        w AS (
          SELECT o.o_custkey,
            CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS window_rev,
            COUNT(*) AS n_orders
          FROM orders o JOIN anchor a ON o.o_custkey = a.ck
          WHERE o.o_orderdate >= a.first_d
            AND o.o_orderdate <= a.first_d + INTERVAL 90 DAY
          GROUP BY o.o_custkey)
        SELECT
          ROUND(CAST(SUM(CAST(window_rev AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_window_rev,
          ROUND(CAST(SUM(CAST(CAST(n_orders AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_window_orders,
          COUNT(*) AS n_customers
        FROM w""")),

    // q65: parts whose revenue sits below 30% of the all-parts average —
    // a grouped aggregate joined against a scalar aggregate OF the same
    // grouped aggregate (two aggregation levels sharing one child).
    QueryDef(
      "tpcds_below_avg_parts",
      (s, dir) => {
        val rev = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev"))
        val avgRev = rev.agg(avg(col("rev")).as("avg_rev"))
        rev.crossJoin(broadcast(avgRev))
          .filter(col("rev") < col("avg_rev") * 0.3)
          .select(col("l_partkey"), round(col("rev"), 2).as("rev"),
            round(col("avg_rev"), 2).as("avg_rev"))
          .orderBy(col("l_partkey"))
          .limit(100)
      },
      Some("""
        WITH rev AS (
          SELECT l_partkey,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,2)))
              AS DOUBLE) AS rev
          FROM lineitem GROUP BY l_partkey),
        a AS (SELECT AVG(rev) AS avg_rev FROM rev)
        SELECT l_partkey, ROUND(rev, 2) AS rev, ROUND(avg_rev, 2) AS avg_rev
        FROM rev, a
        WHERE rev < avg_rev * 0.3
        ORDER BY l_partkey
        LIMIT 100""")),

    // q93: net sales per customer with returned lines' value credited
    // back — a LEFT join against the returns subset with COALESCE
    // arithmetic instead of an anti-join.
    QueryDef(
      "tpcds_net_after_returns",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val ret = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("rk"), col("l_linenumber").as("rn"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("ret_val"))
        val net = li.join(ret,
            li("l_orderkey") === ret("rk") && li("l_linenumber") === ret("rn"),
            "left")
          .select(col("l_orderkey"),
            ((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
              coalesce(col("ret_val"), lit(0.0))).as("net_val"))
        net.join(o, net("l_orderkey") === o("o_orderkey"))
          .groupBy((col("o_custkey") % 100).as("cust_band"))
          .agg(dsum6(col("net_val")).as("net_sales"))
          .select(col("cust_band"), round(col("net_sales"), 2).as("net_sales"))
          .orderBy(col("cust_band"))
      },
      Some("""
        WITH ret AS (
          SELECT l_orderkey AS rk, l_linenumber AS rn,
            l_extendedprice * (1.0 - l_discount) AS ret_val
          FROM lineitem WHERE l_returnflag = 'R'),
        net AS (
          SELECT l.l_orderkey,
            l.l_extendedprice * (1.0 - l.l_discount) - COALESCE(ret.ret_val, 0.0) AS net_val
          FROM lineitem l LEFT JOIN ret
            ON l.l_orderkey = ret.rk AND l.l_linenumber = ret.rn)
        SELECT o.o_custkey % 100 AS cust_band,
          ROUND(CAST(SUM(CAST(net.net_val AS DECIMAL(18,6))) AS DOUBLE), 2) AS net_sales
        FROM net JOIN orders o ON net.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey % 100
        ORDER BY cust_band"""))
  )
}
