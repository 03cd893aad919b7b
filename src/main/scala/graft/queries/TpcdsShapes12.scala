package graft.queries

import graft.{QueryDef, Tables}

/** Twelfth TPC-DS shape wave — closes the corpus accounting to 100/100.
  * The reference's plan gate runs every file in
  * /root/reference/tests/optimizers/tpcds/queries/ (100 files, q1–q99 +
  * q75-2); waves 1–11 mapped ~80 q-numbers and adjudicated the rest as
  * structural duplicates. This wave turns that adjudication into green
  * rows: one query per remaining q-number, each re-expressed on the
  * engine's star schema with the shape feature that q-number gates —
  *
  *  - q7/q26: multi-dim star, OR predicate on a promo-like dim, four
  *    averages per item group (q26 = same template, catalog channel →
  *    a different fact slice here);
  *  - q19: brand aggregate gated by a CROSS-dim inequality
  *    (substr(zip)<>substr(zip) → nation-name prefixes of the line's
  *    supplier vs the order's customer);
  *  - q27: ROLLUP + GROUPING() flag over the star;
  *  - q28: six band-bucketed (avg, count, count distinct) triples —
  *    expressed as ONE conditional-aggregate scan instead of the
  *    literal six self-joined subqueries: at 100 TB one pass beats six,
  *    and Catalyst's Expand handles the per-band DISTINCTs;
  *  - q40: sales LEFT JOIN returns with a before/after date split;
  *  - q42/q52/q55: the brand/category monthly aggregate triplet
  *    (deliberately near-identical — that IS the corpus fact);
  *  - q43: day-of-week pivot per dim group (dow split Spark/DuckDB);
  *  - q46/q68/q79: per-ticket sub-aggregate joined back to the
  *    customer dim, bought-vs-home mismatch / substr projection;
  *  - q53/q63/q89: deviation-from-window-average family;
  *  - q76: channel UNION ALL with literal channel tags, grouped;
  *  - q81: correlated avg*1.2 gate per state over returns (q1 family);
  *  - q91: OR-of-AND demographic pair predicate on the star;
  *  - q96: pure count under time-band + dim-band filters.
  *
  * Sums/avgs follow the Num decimal-quantize-then-DOUBLE convention so
  * both engines aggregate exactly; scale notes inline.
  */
object TpcdsShapes12 {

  private def sqlBoth(name: String, tables: Seq[String], sql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

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

  /** Order-independent average of a 2-decimal money column: exact
    * decimal sum, one double division, quantized to 6 places.
    */
  private def avg6(x: String): String =
    s"CAST(CAST(ROUND(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x), 6) AS DECIMAL(18,6)) AS DOUBLE)"

  val defs: Seq[QueryDef] = Seq(

    // q7 shape: star join with an OR predicate on the promo-like dim
    // (orders), four per-brand averages. Dims broadcast; the OR is a
    // residual on the already-shuffled fact — one pass.
    sqlBoth(
      "tpcds_q7_dim_or_item_avgs",
      Seq("lineitem", "part", "orders"),
      s"""
        SELECT p_brand,
               ${avg6("l_quantity")} AS agg1,
               ${avg6("l_extendedprice")} AS agg2,
               ${avg6("l_discount")} AS agg3,
               ${avg6("l_tax")} AS agg4
        FROM lineitem
        JOIN part   ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
          AND YEAR(o_orderdate) = 1996
        GROUP BY p_brand
        ORDER BY p_brand LIMIT 100"""),

    // q26 shape: q7's template on the other channel — here the other
    // fact slice (open orders), grouped by type instead of brand.
    sqlBoth(
      "tpcds_q26_alt_channel_avgs",
      Seq("lineitem", "part", "orders"),
      s"""
        SELECT p_type,
               ${avg6("l_quantity")} AS agg1,
               ${avg6("l_extendedprice")} AS agg2,
               ${avg6("l_discount")} AS agg3,
               ${avg6("l_tax")} AS agg4
        FROM lineitem
        JOIN part   ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
          AND (o_orderpriority LIKE '3%' OR o_orderpriority LIKE '4%')
          AND YEAR(o_orderdate) = 1997
        GROUP BY p_type
        ORDER BY p_type LIMIT 100"""),

    // q19 shape: brand revenue where the line's supplier sits in a
    // nation whose name prefix differs from the order customer's —
    // the cross-dim inequality is a join residual, never a join key,
    // so both dim chains still broadcast.
    sqlBoth(
      "tpcds_q19_brand_prefix_mismatch",
      Seq("lineitem", "part", "supplier", "orders", "customer", "nation"),
      """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ext_price
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE SUBSTR(sn.n_name, 8, 3) <> SUBSTR(cn.n_name, 8, 3)
          AND YEAR(o_orderdate) = 1996
          AND p_size BETWEEN 10 AND 40
        GROUP BY p_brand
        ORDER BY ext_price DESC, p_brand LIMIT 100"""),

    // q27 shape: ROLLUP over (brand, supplier nation) with the
    // GROUPING() flag surfaced, nation IN-list filter; partial
    // aggregation happens before the rollup expansion.
    sqlBoth(
      "tpcds_q27_rollup_grouping_state",
      Seq("lineitem", "part", "supplier", "nation"),
      s"""
        SELECT p_brand, n_name, GROUPING(n_name) AS g_state,
               ${avg6("l_quantity")} AS agg1,
               ${avg6("l_extendedprice")} AS agg2
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY ROLLUP (p_brand, n_name)
        ORDER BY p_brand NULLS FIRST, n_name NULLS FIRST LIMIT 100"""),

    // q28 shape: six quantity bands × (avg, count, count distinct) of
    // list price under per-band OR disjunctions. The literal TPC-DS
    // text cross-joins six scalar subqueries — six scans; here it is
    // ONE conditional-aggregate scan (CASE feeds every aggregate), the
    // plan that survives 100 TB. Catalyst's Expand covers the six
    // distinct aggregates in the same pass.
    sqlBoth(
      "tpcds_q28_band_distinct_buckets",
      Seq("lineitem"),
      (1 to 6).map { b =>
        val lo = (b - 1) * 8; val hi = lo + 7
        val band =
          s"""(l_quantity BETWEEN $lo AND $hi AND
              (l_extendedprice BETWEEN ${b * 900} AND ${b * 900 + 10000}
               OR l_discount BETWEEN 0.0${b} AND 0.0${b + 2}
               OR l_tax BETWEEN 0.0${math.max(b - 1, 0)} AND 0.0${b + 1}))"""
        s"""CAST(CAST(ROUND(CAST(SUM(CASE WHEN $band THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
               / NULLIF(COUNT(CASE WHEN $band THEN l_extendedprice END), 0), 4) AS DECIMAL(18,4)) AS DOUBLE) AS b${b}_lp,
           CAST(COUNT(CASE WHEN $band THEN l_extendedprice END) AS BIGINT) AS b${b}_cnt,
           CAST(COUNT(DISTINCT CASE WHEN $band THEN l_extendedprice END) AS BIGINT) AS b${b}_cntd"""
      }.mkString("SELECT ", ", ", " FROM lineitem")),

    // q40 shape: sales LEFT JOIN the returned subset on the full line
    // key, netted amount split before/after a pivot date, grouped by
    // the supplier's nation (the warehouse-state analogue).
    sqlBoth(
      "tpcds_q40_returns_before_after",
      Seq("lineitem", "supplier", "nation", "part"),
      """
        SELECT n_name, p_brand,
               CAST(SUM(CASE WHEN l_shipdate <  TIMESTAMP '1996-06-15 00:00:00'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sales_before,
               CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-06-15 00:00:00'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sales_after
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE l_returnflag <> 'R'
          AND p_retailprice BETWEEN 500 AND 1500
          AND YEAR(l_shipdate) = 1996
        GROUP BY n_name, p_brand
        ORDER BY n_name, p_brand LIMIT 100"""),

    // q42 shape: category × year monthly aggregate, revenue-descending.
    sqlBoth(
      "tpcds_q42_category_month_agg",
      Seq("lineitem", "part"),
      """
        SELECT YEAR(l_shipdate) AS yr, p_type,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ext_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE MONTH(l_shipdate) = 11 AND YEAR(l_shipdate) = 1996
        GROUP BY YEAR(l_shipdate), p_type
        ORDER BY ext_price DESC, yr, p_type LIMIT 100"""),

    // q52 shape: q42 keyed by brand instead of category.
    sqlBoth(
      "tpcds_q52_brand_month_agg",
      Seq("lineitem", "part"),
      """
        SELECT YEAR(l_shipdate) AS yr, p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ext_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE MONTH(l_shipdate) = 11 AND YEAR(l_shipdate) = 1996
        GROUP BY YEAR(l_shipdate), p_brand
        ORDER BY yr, ext_price DESC, p_brand LIMIT 100"""),

    // q55 shape: brand aggregate under a different dim gate (size band
    // standing in for manager id).
    sqlBoth(
      "tpcds_q55_brand_mgr_agg",
      Seq("lineitem", "part"),
      """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ext_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE MONTH(l_shipdate) = 11 AND YEAR(l_shipdate) = 1997
          AND p_size BETWEEN 20 AND 28
        GROUP BY p_brand
        ORDER BY ext_price DESC, p_brand LIMIT 100"""),

    // q43 shape: per-nation day-of-week pivot. Spark's DAYOFWEEK is
    // Sunday=1, DuckDB's Sunday=0 — the only text difference.
    {
      def q43(dow: String) = s"""
        SELECT n_name,
               CAST(SUM(CASE WHEN $dow = 1 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sun_sales,
               CAST(SUM(CASE WHEN $dow = 2 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS mon_sales,
               CAST(SUM(CASE WHEN $dow = 3 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS tue_sales,
               CAST(SUM(CASE WHEN $dow = 4 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS wed_sales,
               CAST(SUM(CASE WHEN $dow = 5 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS thu_sales,
               CAST(SUM(CASE WHEN $dow = 6 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS fri_sales,
               CAST(SUM(CASE WHEN $dow = 7 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sat_sales
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE YEAR(o_orderdate) = 1996
        GROUP BY n_name
        ORDER BY n_name LIMIT 100"""
      sqlSplit(
        "tpcds_q43_weekday_nation_pivot",
        Seq("orders", "customer", "nation"),
        q43("DAYOFWEEK(o_orderdate)"),
        q43("(DAYOFWEEK(o_orderdate) + 1)"))
    },

    // q46 shape: per-ticket (order) sub-aggregate carrying the bought
    // nation (line supplier's), joined back to the customer whose HOME
    // nation differs. The sub-aggregate shuffles at order grain once;
    // customer + nation broadcast.
    sqlBoth(
      "tpcds_q46_bought_vs_home_nation",
      Seq("lineitem", "supplier", "nation", "orders", "customer"),
      """
        WITH dn AS (
          SELECT l_orderkey, sn.n_name AS bought_nation,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS amt
          FROM lineitem
          JOIN supplier  ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          GROUP BY l_orderkey, sn.n_name)
        SELECT c_name, cn.n_name AS home_nation, bought_nation, l_orderkey AS ticket, amt
        FROM dn
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE cn.n_name <> bought_nation
          AND o_orderpriority LIKE '1%'
        ORDER BY c_name, home_nation, bought_nation, ticket LIMIT 100"""),

    // q68 shape: the q46 skeleton with price/tax extended sums and a
    // different gate — kept as its own green row because the reference
    // gates the q-number separately.
    sqlBoth(
      "tpcds_q68_ticket_mismatch_tax",
      Seq("lineitem", "supplier", "nation", "orders", "customer"),
      """
        WITH dn AS (
          SELECT l_orderkey, sn.n_name AS bought_nation,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS extended_price,
                 CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(18,4))) AS DOUBLE) AS extended_tax
          FROM lineitem
          JOIN supplier  ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE l_linestatus = 'F'
          GROUP BY l_orderkey, sn.n_name)
        SELECT c_name, bought_nation, l_orderkey AS ticket, extended_price, extended_tax
        FROM dn
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE cn.n_name <> bought_nation
          AND o_orderstatus = 'F'
        ORDER BY c_name, ticket LIMIT 100"""),

    // q79 shape: per-ticket amount/profit joined to the customer, the
    // dim string SUBSTR'd in the projection, profit-descending.
    sqlBoth(
      "tpcds_q79_ticket_profit_substr",
      Seq("lineitem", "supplier", "nation", "orders", "customer"),
      """
        WITH ms AS (
          SELECT l_orderkey, sn.n_name AS s_nation,
                 CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS amt,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - l_quantity * 100 AS DECIMAL(18,4))) AS DOUBLE) AS profit
          FROM lineitem
          JOIN supplier  ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE l_returnflag = 'N'
          GROUP BY l_orderkey, sn.n_name)
        SELECT c_name, SUBSTR(s_nation, 1, 5) AS nation5, l_orderkey AS ticket, amt, profit
        FROM ms
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY c_name, nation5, profit DESC, ticket LIMIT 100"""),

    // q53 shape: quarterly brand sums vs the brand's window average,
    // keep >10% deviations. Window partitions at brand grain — tiny
    // after the aggregate, no second fact shuffle.
    sqlBoth(
      "tpcds_q53_quarterly_deviation",
      Seq("lineitem", "part"),
      """
        SELECT * FROM (
          SELECT p_brand,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_sales,
                 CAST(CAST(ROUND(AVG(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,6)))
                   OVER (PARTITION BY p_brand), 4) AS DECIMAL(18,4)) AS DOUBLE) AS avg_quarterly_sales
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE YEAR(l_shipdate) = 1996
          GROUP BY p_brand, QUARTER(l_shipdate)) tmp
        WHERE CASE WHEN avg_quarterly_sales > 0
              THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
              ELSE NULL END > 0.1
        ORDER BY avg_quarterly_sales, sum_sales, p_brand LIMIT 100"""),

    // q63 shape: the monthly variant keyed by type (manager analogue).
    sqlBoth(
      "tpcds_q63_monthly_deviation",
      Seq("lineitem", "part"),
      """
        SELECT * FROM (
          SELECT p_type,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_sales,
                 CAST(CAST(ROUND(AVG(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,6)))
                   OVER (PARTITION BY p_type), 4) AS DECIMAL(18,4)) AS DOUBLE) AS avg_monthly_sales
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE YEAR(l_shipdate) = 1996
          GROUP BY p_type, MONTH(l_shipdate)) tmp
        WHERE CASE WHEN avg_monthly_sales > 0
              THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
              ELSE NULL END > 0.1
        ORDER BY p_type, avg_monthly_sales, sum_sales LIMIT 100"""),

    // q89 shape: the deviation family over (brand × supplier nation ×
    // month) with the OR-of-AND category gate, ordered by the gap.
    sqlBoth(
      "tpcds_q89_monthly_deviation_nation",
      Seq("lineitem", "part", "supplier", "nation"),
      """
        SELECT * FROM (
          SELECT p_brand, n_name, MONTH(l_shipdate) AS moy,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_sales,
                 CAST(CAST(ROUND(AVG(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,6)))
                   OVER (PARTITION BY p_brand, n_name), 4) AS DECIMAL(18,4)) AS DOUBLE) AS avg_monthly_sales
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE YEAR(l_shipdate) = 1996
            AND ((p_type LIKE 'STANDARD%' AND p_size < 20)
              OR (p_type LIKE 'LARGE%' AND p_size >= 20))
          GROUP BY p_brand, n_name, MONTH(l_shipdate)) tmp
        WHERE CASE WHEN avg_monthly_sales <> 0
              THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
              ELSE NULL END > 0.1
        ORDER BY sum_sales - avg_monthly_sales, n_name, p_brand, moy LIMIT 100"""),

    // q76 shape: three channels normalized through UNION ALL with
    // literal channel tags, grouped across channels. Each arm is its
    // own pushed-filter scan; the union collapses into one aggregate.
    sqlBoth(
      "tpcds_q76_channel_tag_union",
      Seq("lineitem", "orders", "events"),
      """
        SELECT channel, col_name, yr, qoy,
               CAST(COUNT(*) AS BIGINT) AS sales_cnt,
               CAST(SUM(CAST(amt AS DECIMAL(18,2))) AS DOUBLE) AS sales_amt
        FROM (
          SELECT 'line' AS channel, 'l_returnflag' AS col_name,
                 YEAR(l_shipdate) AS yr, QUARTER(l_shipdate) AS qoy,
                 l_extendedprice AS amt
          FROM lineitem WHERE l_returnflag = 'R'
          UNION ALL
          SELECT 'order', 'o_orderstatus',
                 YEAR(o_orderdate), QUARTER(o_orderdate), o_totalprice
          FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT 'event', 'event_type',
                 YEAR(ts), QUARTER(ts), value
          FROM events WHERE event_type = 'purchase') foo
        GROUP BY channel, col_name, yr, qoy
        ORDER BY channel, col_name, yr, qoy LIMIT 100"""),

    // q81 shape: returns totalled per (customer, nation), customers
    // above 1.2× their nation's average (correlated gate → decorrelated
    // re-aggregate at nation grain), home-region filter on the output.
    sqlBoth(
      "tpcds_q81_nation_return_gate",
      Seq("lineitem", "orders", "customer", "nation", "region"),
      """
        WITH ctr AS (
          SELECT o_custkey AS cust, c_nationkey AS nat,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_return
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE l_returnflag = 'R'
          GROUP BY o_custkey, c_nationkey)
        SELECT c_name, n_name, ctr1.total_return
        FROM ctr ctr1
        JOIN customer ON ctr1.cust = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE ctr1.total_return > (SELECT AVG(total_return) * 1.2
                                   FROM ctr ctr2 WHERE ctr1.nat = ctr2.nat)
          AND r_name = 'EUROPE'
        ORDER BY c_name, n_name, ctr1.total_return LIMIT 100"""),

    // q91 shape: star with an OR-of-AND demographic pair predicate,
    // loss-descending. Pairs stay a fact residual; dims broadcast.
    sqlBoth(
      "tpcds_q91_or_pair_demographics",
      Seq("orders", "customer", "nation", "region"),
      """
        SELECT n_name, c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS returns_loss
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE ((c_mktsegment = 'BUILDING'  AND o_orderpriority LIKE '1%')
            OR (c_mktsegment = 'MACHINERY' AND o_orderpriority LIKE '5%'))
          AND o_orderstatus = 'F'
          AND r_name = 'ASIA'
          AND YEAR(o_orderdate) = 1996
        GROUP BY n_name, c_mktsegment
        ORDER BY returns_loss DESC, n_name, c_mktsegment"""),

    // q96 shape: a bare COUNT under time-band (hour/minute) + dim-band
    // filters — every predicate pushes into its scan, the count is one
    // partial-agg pipeline.
    sqlBoth(
      "tpcds_q96_time_band_count",
      Seq("events", "customer"),
      """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        JOIN customer ON user_id = c_custkey
        WHERE HOUR(ts) = 20 AND MINUTE(ts) >= 30
          AND c_mktsegment = 'BUILDING'""")
  )
}
