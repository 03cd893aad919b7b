package graft.queries

import graft.{QueryDef, Tables}

/** Eighth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/tests/optimizers/tpcds/queries/): twelve plan
  * features the first seven waves don't exercise —
  *
  *  - q1/q30: correlated scalar subquery comparing each row against
  *    1.2× ITS GROUP's average (must decorrelate to one aggregate +
  *    one join, never a per-row subquery);
  *  - q4/q11/q74: four-way self-join of customer-year aggregates with
  *    a cross-channel ratio gate;
  *  - q5/q77/q80: channels normalized through UNION ALL then ROLLUP;
  *  - q10/q35/q69: EXISTS and NOT EXISTS gates on the same customer;
  *  - q16/q94: multi-supplier EXISTS + no-returns NOT EXISTS over a
  *    fact self-reference, distinct-count output;
  *  - q17/q25/q29: three fact instances chained buy→return→rebuy;
  *  - q38: three-channel INTERSECT cardinality;
  *  - q54: per-customer revenue banded into segments, histogram;
  *  - q59: day-of-week pivot, week self-joined year-over-year (the
  *    one wave-8 query whose oracle text differs: DuckDB's dayofweek
  *    is Sunday=0 where Spark's is Sunday=1);
  *  - q78: channel ratio with returned lines anti-joined away;
  *  - q93: LEFT JOIN returns substitution into the sales recompute;
  *  - q12/q20/q98: revenue share-of-class via a window partition sum.
  *
  * Sums follow the decimal-quantize-then-DOUBLE convention; window
  * shares divide two EXACT decimals cast to double, so both engines
  * derive bit-identical ratios. Scale notes inline per query.
  */
object TpcdsShapes8 {

  private def sqlBoth(name: String, tables: Seq[String], sql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

  /** Same, but the oracle SQL differs (engine builtin semantics). */
  private def sqlSplit(
      name: String, tables: Seq[String],
      sparkSql: String, oracleSql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sparkSql)
      },
      Some(oracleSql))

  val defs: Seq[QueryDef] = Seq(

    // q1/q30 shape: per-(customer, nation) return totals; keep customers
    // above 1.2× their nation's average. The correlated scalar subquery
    // must decorrelate into ONE re-aggregate of the CTE joined back on
    // nation — at 100 TB the CTE is customer-cardinality, tiny next to
    // the fact scan that builds it.
    sqlBoth(
      "tpcds_q1_corr_avg_gate",
      Seq("lineitem", "orders", "customer"),
      """
        WITH ctr AS (
          SELECT c_nationkey AS nat, o_custkey AS cust,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_return
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE l_returnflag = 'R'
          GROUP BY c_nationkey, o_custkey)
        SELECT cust, nat, total_return
        FROM ctr c1
        WHERE total_return > (SELECT AVG(total_return) * 1.2
                              FROM ctr c2 WHERE c2.nat = c1.nat)
        ORDER BY total_return DESC, cust LIMIT 100"""),

    // q4/q11/q74 shape: customer-year totals per channel, self-joined
    // four ways (two channels × two years); the web growth ratio must
    // beat the store growth ratio. Each arm is the SAME pre-aggregated
    // frame (customer cardinality), so the joins are cheap; only the
    // frame build scans the fact.
    sqlBoth(
      "tpcds_q4_year_ratio_channels",
      Seq("orders"),
      """
        WITH yearly AS (
          SELECT o_custkey AS cust, YEAR(o_orderdate) AS yr,
                 CASE WHEN o_orderpriority < '3' THEN 'store' ELSE 'web' END AS chan,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM orders
          WHERE YEAR(o_orderdate) IN (1996, 1997)
          GROUP BY o_custkey, YEAR(o_orderdate),
                   CASE WHEN o_orderpriority < '3' THEN 'store' ELSE 'web' END)
        SELECT s1.cust AS cust,
               CAST(CAST(ROUND(w2.tot / w1.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS web_ratio,
               CAST(CAST(ROUND(s2.tot / s1.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS store_ratio
        FROM yearly s1 JOIN yearly s2 ON s1.cust = s2.cust
        JOIN yearly w1 ON s1.cust = w1.cust
        JOIN yearly w2 ON s1.cust = w2.cust
        WHERE s1.chan = 'store' AND s1.yr = 1996
          AND s2.chan = 'store' AND s2.yr = 1997
          AND w1.chan = 'web'   AND w1.yr = 1996
          AND w2.chan = 'web'   AND w2.yr = 1997
          AND s1.tot > 0 AND w1.tot > 0
          AND w2.tot / w1.tot > s2.tot / s1.tot
        ORDER BY cust"""),

    // q5/q77/q80 shape: per-channel sales+returns normalized to one
    // schema through UNION ALL, then ROLLUP(channel, group). The union
    // arms are each one conditional-agg pass; the rollup runs over
    // channel×group cardinality, not events.
    sqlBoth(
      "tpcds_q5_union_rollup",
      Seq("events"),
      """
        WITH per_chan AS (
          SELECT 'web' AS channel, user_id % 10 AS grp,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sales,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events WHERE event_type = 'click' GROUP BY user_id % 10
          UNION ALL
          SELECT 'store' AS channel, user_id % 10 AS grp,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sales,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events WHERE event_type = 'purchase' GROUP BY user_id % 10)
        SELECT channel, grp,
               CAST(CAST(ROUND(SUM(sales), 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_sales,
               CAST(SUM(cnt) AS BIGINT) AS total_cnt
        FROM per_chan
        GROUP BY ROLLUP(channel, grp)
        ORDER BY channel ASC NULLS FIRST, grp ASC NULLS FIRST"""),

    // q10/q35/q69 shape: customers gated by EXISTS in one channel AND
    // NOT EXISTS in another — one semi-join + one anti-join against
    // key-only subqueries, then a tiny per-nation count.
    sqlBoth(
      "tpcds_q10_exists_notexists",
      Seq("customer", "orders", "lineitem"),
      """
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND YEAR(o_orderdate) = 1996)
          AND NOT EXISTS (SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                          WHERE o_custkey = c_custkey AND l_returnflag = 'R'
                            AND YEAR(o_orderdate) = 1996)
        GROUP BY c_nationkey
        ORDER BY c_nationkey"""),

    // q16/q94 shape: orders shipped by ≥2 suppliers (EXISTS over a fact
    // self-reference) with zero returned lines (NOT EXISTS) — distinct
    // order count + total. Both gates are orderkey-equi semi/anti joins,
    // so the fact shuffles once on its own key.
    sqlBoth(
      "tpcds_q16_multisupp_noreturn",
      Seq("orders", "lineitem"),
      """
        SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_ship
        FROM orders JOIN lineitem l1 ON o_orderkey = l1.l_orderkey
        WHERE YEAR(o_orderdate) = 1996
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = o_orderkey
                            AND l3.l_returnflag = 'R')"""),

    // q17/q25/q29 shape: buy → return → buy again, three instances of
    // the fact chained on (customer, part). Each arm is pre-filtered
    // before the join; join keys are selective (cust, part) pairs, so
    // fan-out stays bounded by per-customer-part line counts.
    sqlBoth(
      "tpcds_q17_buy_return_rebuy",
      Seq("lineitem", "orders", "part"),
      """
        WITH sales AS (
          SELECT o_custkey AS cust, l_partkey AS part, o_orderkey AS ord,
                 l_quantity AS qty, o_orderdate AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'N'),
        rets AS (
          SELECT o_custkey AS cust, l_partkey AS part, l_quantity AS qty,
                 o_orderdate AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R')
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS chains,
               CAST(CAST(ROUND(AVG(s1.qty), 4) AS DECIMAL(18,4)) AS DOUBLE) AS avg_first_qty,
               CAST(CAST(ROUND(AVG(s2.qty), 4) AS DECIMAL(18,4)) AS DOUBLE) AS avg_rebuy_qty
        FROM sales s1
        JOIN rets r  ON s1.cust = r.cust  AND s1.part = r.part  AND r.d >= s1.d
        JOIN sales s2 ON s1.cust = s2.cust AND s1.part = s2.part AND s2.d > r.d
        JOIN part ON s1.part = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand"""),

    // q38 shape: customers active in all three priority channels —
    // INTERSECT cardinality, key-only set ops end to end.
    sqlBoth(
      "tpcds_q38_intersect_count",
      Seq("orders"),
      """
        SELECT CAST(COUNT(*) AS BIGINT) AS num_customers FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '2%'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '3%') t"""),

    // q54 shape: customers banded by lifetime revenue into fixed-width
    // segments, segment histogram. The banding floor runs on an exact
    // decimal total cast to double, so both engines bucket identically.
    sqlBoth(
      "tpcds_q54_revenue_bands",
      Seq("orders"),
      """
        WITH spend AS (
          SELECT o_custkey AS cust,
                 CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                            / 50000) AS INT) AS segment
          FROM orders GROUP BY o_custkey)
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS num_customers
        FROM spend
        GROUP BY segment
        HAVING COUNT(*) >= 3
        ORDER BY segment LIMIT 100"""),

    // q59 shape: weekly sales pivoted by day-of-week, week self-joined
    // against the same week next year, per-day ratios. Oracle text
    // differs ONLY in the dow index: DuckDB dayofweek is Sunday=0,
    // Spark is Sunday=1.
    {
      def q59(dow: String) = s"""
        WITH wss AS (
          SELECT YEAR(o_orderdate) AS yr, WEEKOFYEAR(o_orderdate) AS wk,
                 CAST(SUM(CASE WHEN $dow = 1 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sun_sales,
                 CAST(SUM(CASE WHEN $dow = 2 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS mon_sales,
                 CAST(SUM(CASE WHEN $dow = 6 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS fri_sales
          FROM orders
          GROUP BY YEAR(o_orderdate), WEEKOFYEAR(o_orderdate))
        SELECT s1.wk AS wk,
               CAST(CAST(ROUND(s2.sun_sales / s1.sun_sales, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sun_ratio,
               CAST(CAST(ROUND(s2.mon_sales / s1.mon_sales, 6) AS DECIMAL(18,6)) AS DOUBLE) AS mon_ratio,
               CAST(CAST(ROUND(s2.fri_sales / s1.fri_sales, 6) AS DECIMAL(18,6)) AS DOUBLE) AS fri_ratio
        FROM wss s1 JOIN wss s2 ON s1.wk = s2.wk AND s2.yr = s1.yr + 1
        WHERE s1.yr = 1996
        ORDER BY wk"""
      sqlSplit(
        "tpcds_q59_dow_week_ratio",
        Seq("orders"),
        q59("DAYOFWEEK(o_orderdate)"),
        q59("(DAYOFWEEK(o_orderdate) + 1)"))
    },

    // q78 shape: per-(year, customer) channel totals with returned
    // lines ANTI-JOINED away (NOT EXISTS on order+part in the returns
    // subset), cross-channel ratio on the join of the two frames.
    sqlBoth(
      "tpcds_q78_ratio_noreturns",
      Seq("orders", "lineitem"),
      """
        WITH clean AS (
          SELECT o_custkey AS cust, YEAR(o_orderdate) AS yr,
                 o_orderpriority AS pri, l_extendedprice AS price
          FROM lineitem s JOIN orders ON s.l_orderkey = o_orderkey
          WHERE s.l_returnflag = 'N'
            AND NOT EXISTS (SELECT 1 FROM lineitem r
                            WHERE r.l_orderkey = s.l_orderkey
                              AND r.l_partkey = s.l_partkey
                              AND r.l_returnflag = 'R')),
        web AS (
          SELECT cust, yr, CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM clean WHERE pri >= '3' GROUP BY cust, yr),
        store AS (
          SELECT cust, yr, CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM clean WHERE pri < '3' GROUP BY cust, yr)
        SELECT w.cust AS cust, w.yr AS yr,
               CAST(CAST(ROUND(w.tot / s.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS web_store_ratio
        FROM web w JOIN store s ON w.cust = s.cust AND w.yr = s.yr
        ORDER BY web_store_ratio DESC, cust, yr LIMIT 100"""),

    // q93 shape: returns substituted into the sales recompute — sales
    // LEFT JOIN returns on (order, part), quantity netted when matched.
    // Fact joins a small fact subset on the fact's own key.
    sqlBoth(
      "tpcds_q93_returns_substitution",
      Seq("orders", "lineitem"),
      """
        WITH rets AS (
          SELECT l_orderkey AS ord, l_partkey AS part, l_quantity AS rqty
          FROM lineitem WHERE l_returnflag = 'R')
        SELECT o_custkey AS cust,
               CAST(SUM(CAST((s.l_quantity - COALESCE(r.rqty, 0)) * s.l_extendedprice
                        AS DECIMAL(18,2))) AS DOUBLE) AS sumsales
        FROM lineitem s
        JOIN orders ON s.l_orderkey = o_orderkey
        LEFT JOIN rets r ON s.l_orderkey = r.ord AND s.l_partkey = r.part
        WHERE s.l_returnflag = 'N'
        GROUP BY o_custkey
        ORDER BY sumsales DESC, cust LIMIT 100"""),

    // q12/q20/q98 shape: revenue share of each brand within its class
    // via a window partition sum. The share divides two EXACT decimal
    // sums (window SUM over DECIMAL, never double) cast to double, so
    // partition order cannot perturb the ratio on either engine.
    sqlBoth(
      "tpcds_q98_class_share_window",
      Seq("lineitem", "part"),
      """
        WITH rev AS (
          SELECT p_type AS class, p_brand AS brand,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE YEAR(l_shipdate) = 1996
          GROUP BY p_type, p_brand)
        SELECT class, brand,
               CAST(r AS DOUBLE) AS itemrevenue,
               CAST(CAST(ROUND(CAST(r AS DOUBLE) * 100 /
                    CAST(SUM(r) OVER (PARTITION BY class) AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS DOUBLE) AS revenueratio
        FROM rev
        ORDER BY class, revenueratio, brand""")
  )
}
