package graft.queries

import graft.{QueryDef, Tables}

/** Ninth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/tests/optimizers/tpcds/queries/): twelve plan
  * features waves 1–8 don't exercise —
  *
  *  - q8/q15/q45: disjunction of an IN-list predicate with EXISTS —
  *    must plan as ONE ExistenceJoin feeding the OR, not a union
  *    re-scan;
  *  - q13/q48: OR of conjunctive (status × price-band) arms pushed into
  *    a single scan;
  *  - q18/q22: AVG over a four-level ROLLUP hierarchy;
  *  - q31: six aggregated frames (2 channels × 3 quarters) joined on
  *    nation, growth-ratio chain compared across channels;
  *  - q33/q56/q60: UNION ALL arms each semi-gated by the same dim
  *    IN-subquery, re-aggregated per brand;
  *  - q34/q73: per-order line-count HAVING band, joined back to the
  *    customer dim for per-customer frequency;
  *  - q36/q86: RANK() within each ROLLUP grouping level (partition by
  *    grouping flags + parent key);
  *  - q58/q83: three channel frames joined with mutual parity bands
  *    (each within ±50% of the three-channel average);
  *  - q50/q62/q99: order→ship lag bucketed 30/60/90/120/120+ into a
  *    conditional-agg pivot (testdata lineitem has no receiptdate or
  *    shipmode, so the lag axis is orderdate→shipdate per linestatus);
  *  - q67: top-k per manufacturer via rank over the ROLLUP output
  *    (null grouping levels rank in their own partition);
  *  - q71: three time-of-day windows unioned then regrouped by hour;
  *  - q75: returns-netted per-(year, brand) sales self-joined YoY,
  *    keeping brands that declined below 0.9×.
  *
  * Sums follow the decimal-quantize-then-DOUBLE convention; ratios
  * divide exact-decimal-derived doubles and re-quantize. Scale notes
  * inline per query.
  */
object TpcdsShapes9 {

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

    // q8/q15/q45 shape: customers kept by phone-prefix IN-list OR an
    // EXISTS over their orders. The OR forces an ExistenceJoin (boolean
    // column, not a filter-only semi-join) — at 100 TB this is one
    // customer-key shuffle against the pre-filtered orders subset,
    // never a per-row subquery.
    sqlBoth(
      "tpcds_q8_exists_or_predicate",
      Seq("customer", "orders"),
      """
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           OR EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_nationkey
        ORDER BY c_nationkey"""),

    // q13/q48 shape: disjunction of conjunctive (priority × price-band)
    // arms — one scan, the whole OR pushed to the parquet reader, then
    // plain aggregates per order status.
    sqlBoth(
      "tpcds_q13_disjunct_bands",
      Seq("orders"),
      """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               CAST(CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS avg_price
        FROM orders
        WHERE (o_orderpriority = '1-URGENT'   AND o_totalprice BETWEEN 1000  AND 80000)
           OR (o_orderpriority = '2-HIGH'     AND o_totalprice BETWEEN 50000 AND 160000)
           OR (o_orderpriority = '3-MEDIUM'   AND o_totalprice BETWEEN 100000 AND 250000)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus"""),

    // q18/q22 shape: AVG over a three-level rollup hierarchy
    // (brand → type → size). The rollup runs over the joined
    // lineitem×part rows but its output is hierarchy-cardinality;
    // the part dim broadcasts.
    sqlBoth(
      "tpcds_q22_rollup_avg_hierarchy",
      Seq("lineitem", "part"),
      """
        SELECT p_brand, p_type, p_size,
               CAST(CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY ROLLUP(p_brand, p_type, p_size)
        ORDER BY p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST,
                 p_size ASC NULLS FIRST"""),

    // q31 shape: one fact pass builds per-(nation, quarter, channel)
    // totals; six frames of it join on nation; nations qualify when the
    // web growth ratio beats the store ratio in BOTH consecutive
    // quarter steps. The chain joins are nation-cardinality — trivial
    // next to the single fact scan that feeds them.
    sqlBoth(
      "tpcds_q31_growth_ratio_chain",
      Seq("orders", "customer"),
      """
        WITH qtr AS (
          SELECT c_nationkey AS nat, QUARTER(o_orderdate) AS q,
                 CASE WHEN o_orderpriority < '3' THEN 'store' ELSE 'web' END AS chan,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE YEAR(o_orderdate) = 1996 AND QUARTER(o_orderdate) <= 3
          GROUP BY c_nationkey, QUARTER(o_orderdate),
                   CASE WHEN o_orderpriority < '3' THEN 'store' ELSE 'web' END)
        SELECT w1.nat AS nat,
               CAST(CAST(ROUND(w2.tot / w1.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS web_g1,
               CAST(CAST(ROUND(w3.tot / w2.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS web_g2,
               CAST(CAST(ROUND(s2.tot / s1.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS store_g1,
               CAST(CAST(ROUND(s3.tot / s2.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS store_g2
        FROM qtr w1 JOIN qtr w2 ON w1.nat = w2.nat
        JOIN qtr w3 ON w1.nat = w3.nat
        JOIN qtr s1 ON w1.nat = s1.nat
        JOIN qtr s2 ON w1.nat = s2.nat
        JOIN qtr s3 ON w1.nat = s3.nat
        WHERE w1.chan = 'web'   AND w1.q = 1
          AND w2.chan = 'web'   AND w2.q = 2
          AND w3.chan = 'web'   AND w3.q = 3
          AND s1.chan = 'store' AND s1.q = 1
          AND s2.chan = 'store' AND s2.q = 2
          AND s3.chan = 'store' AND s3.q = 3
          AND w2.tot / w1.tot > s2.tot / s1.tot
          AND w3.tot / w2.tot > s3.tot / s2.tot
        ORDER BY nat"""),

    // q33/q56/q60 shape: three UNION ALL arms over disjoint date
    // windows, each semi-gated by the SAME part-type IN-subquery, then
    // re-aggregated per brand. The dim subquery is evaluated once and
    // broadcast into each arm's semi-join.
    sqlBoth(
      "tpcds_q33_inlist_union_brands",
      Seq("lineitem", "part"),
      """
        WITH reds AS (SELECT p_type FROM part WHERE p_name LIKE '%red%'),
        arms AS (
          SELECT p_brand AS brand, CAST(l_extendedprice AS DECIMAL(18,2)) AS p
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-04-30'
            AND p_type IN (SELECT p_type FROM reds)
          UNION ALL
          SELECT p_brand, CAST(l_extendedprice AS DECIMAL(18,2))
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate BETWEEN DATE '1996-05-01' AND DATE '1996-08-31'
            AND p_type IN (SELECT p_type FROM reds)
          UNION ALL
          SELECT p_brand, CAST(l_extendedprice AS DECIMAL(18,2))
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate BETWEEN DATE '1996-09-01' AND DATE '1996-12-31'
            AND p_type IN (SELECT p_type FROM reds))
        SELECT brand, CAST(SUM(p) AS DOUBLE) AS total_sales
        FROM arms
        GROUP BY brand
        ORDER BY total_sales DESC, brand LIMIT 100"""),

    // q34/q73 shape: orders whose line count falls in a band (HAVING
    // BETWEEN on the per-order aggregate), joined back to the customer
    // dim for a per-customer frequency. The band filter runs on the
    // orderkey-grouped aggregate — fact-cardinality in, order-
    // cardinality out — before any dim join.
    sqlBoth(
      "tpcds_q34_lines_band_customers",
      Seq("lineitem", "orders", "customer"),
      """
        WITH banded AS (
          SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lineitem
          GROUP BY l_orderkey
          HAVING COUNT(*) BETWEEN 5 AND 7)
        SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS band_orders,
               CAST(SUM(n_lines) AS BIGINT) AS band_lines
        FROM banded
        JOIN orders ON ok = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        HAVING COUNT(*) >= 2
        ORDER BY band_orders DESC, c_custkey LIMIT 100"""),

    // q36/q86 shape: margin rollup with RANK() inside each grouping
    // LEVEL — partition by the grouping flags plus the parent key, so
    // leaf rows rank among siblings and subtotal rows rank among
    // subtotals. grouping() flags must be computed in the aggregate
    // subquery (they are aggregate-context-only) and partition the
    // outer window.
    sqlBoth(
      "tpcds_q36_rank_within_rollup",
      Seq("lineitem", "orders", "customer", "nation"),
      """
        WITH roll AS (
          SELECT n_name AS nation, o_orderpriority AS pri,
                 GROUPING(n_name) AS g_nat, GROUPING(o_orderpriority) AS g_pri,
                 CAST(CAST(ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))) AS DOUBLE)
                      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS margin
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY ROLLUP(n_name, o_orderpriority))
        SELECT nation, pri, margin,
               CAST(RANK() OVER (
                 PARTITION BY g_nat, g_pri, CASE WHEN g_pri = 1 THEN NULL ELSE nation END
                 ORDER BY margin, pri) AS INT) AS rank_in_level
        FROM roll
        ORDER BY g_nat DESC, g_pri DESC, nation ASC NULLS FIRST,
                 rank_in_level, pri ASC NULLS FIRST"""),

    // q58/q83 shape: the same item aggregated independently in three
    // channels, joined, kept only when every channel sits within ±50%
    // of the three-channel average — mutual band predicates over three
    // customer-cardinality frames built from one fact pass each.
    sqlBoth(
      "tpcds_q58_channel_parity",
      Seq("orders"),
      """
        WITH c1 AS (
          SELECT o_custkey AS cust, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
          FROM orders WHERE o_orderpriority LIKE '1%' GROUP BY o_custkey),
        c2 AS (
          SELECT o_custkey AS cust, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
          FROM orders WHERE o_orderpriority LIKE '2%' GROUP BY o_custkey),
        c3 AS (
          SELECT o_custkey AS cust, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
          FROM orders WHERE o_orderpriority LIKE '3%' GROUP BY o_custkey)
        SELECT c1.cust AS cust,
               CAST(CAST(ROUND(c1.s, 2) AS DECIMAL(18,2)) AS DOUBLE) AS s1,
               CAST(CAST(ROUND(c2.s, 2) AS DECIMAL(18,2)) AS DOUBLE) AS s2,
               CAST(CAST(ROUND(c3.s, 2) AS DECIMAL(18,2)) AS DOUBLE) AS s3
        FROM c1 JOIN c2 ON c1.cust = c2.cust JOIN c3 ON c1.cust = c3.cust
        WHERE c1.s BETWEEN 0.5 * (c1.s + c2.s + c3.s) / 3 AND 1.5 * (c1.s + c2.s + c3.s) / 3
          AND c2.s BETWEEN 0.5 * (c1.s + c2.s + c3.s) / 3 AND 1.5 * (c1.s + c2.s + c3.s) / 3
          AND c3.s BETWEEN 0.5 * (c1.s + c2.s + c3.s) / 3 AND 1.5 * (c1.s + c2.s + c3.s) / 3
        ORDER BY cust"""),

    // q50/q62/q99 shape: order→ship lag bucketed 30/60/90/120/120+ as
    // a conditional-agg pivot per line status — one join, one scan,
    // five counters; no per-bucket re-scan. DATEDIFF argument order
    // differs between engines, hence the split oracle.
    {
      def q62(dd: String) = s"""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN $dd <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
               CAST(SUM(CASE WHEN $dd > 30  AND $dd <= 60  THEN 1 ELSE 0 END) AS BIGINT) AS d60,
               CAST(SUM(CASE WHEN $dd > 60  AND $dd <= 90  THEN 1 ELSE 0 END) AS BIGINT) AS d90,
               CAST(SUM(CASE WHEN $dd > 90  AND $dd <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
               CAST(SUM(CASE WHEN $dd > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
        ORDER BY l_linestatus"""
      sqlSplit(
        "tpcds_q62_ship_lag_buckets",
        Seq("lineitem", "orders"),
        q62("DATEDIFF(l_shipdate, o_orderdate)"),
        q62("DATEDIFF('day', o_orderdate, l_shipdate)"))
    },

    // q67 shape: top-k per part type over the ROLLUP output — the
    // window ranks subtotal rows (brand NULL) and the grand-total row
    // (type NULL partitions alone) exactly like leaf rows. Rollup
    // output is hierarchy-cardinality, so the window is tiny.
    sqlBoth(
      "tpcds_q67_topk_over_rollup",
      Seq("lineitem", "part"),
      """
        WITH roll AS (
          SELECT p_type, p_brand,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY ROLLUP(p_type, p_brand))
        SELECT p_type, p_brand, sales, rk
        FROM (SELECT p_type, p_brand, sales,
                     CAST(RANK() OVER (PARTITION BY p_type
                       ORDER BY sales DESC, p_brand ASC NULLS FIRST) AS INT) AS rk
              FROM roll) t
        WHERE rk <= 3
        ORDER BY p_type ASC NULLS FIRST, rk, p_brand ASC NULLS FIRST"""),

    // q71 shape: three time-of-day windows unioned then regrouped by
    // (event type, hour). Each arm is the same scan with a different
    // pushed hour-range filter; the union re-aggregates at
    // type×hour cardinality.
    sqlBoth(
      "tpcds_q71_hour_breakdown_union",
      Seq("events"),
      """
        WITH arms AS (
          SELECT event_type, HOUR(ts) AS hr, CAST(value AS DECIMAL(18,6)) AS v
          FROM events WHERE HOUR(ts) BETWEEN 7 AND 11
          UNION ALL
          SELECT event_type, HOUR(ts), CAST(value AS DECIMAL(18,6))
          FROM events WHERE HOUR(ts) BETWEEN 17 AND 21
          UNION ALL
          SELECT event_type, HOUR(ts), CAST(value AS DECIMAL(18,6))
          FROM events WHERE HOUR(ts) <= 4)
        SELECT event_type, hr,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(CAST(ROUND(CAST(SUM(v) AS DOUBLE), 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_value
        FROM arms
        GROUP BY event_type, hr
        ORDER BY event_type, hr"""),

    // q75 shape: per-(year, brand) sales with returned quantities
    // netted out via LEFT JOIN on (order, part), self-joined YoY,
    // keeping brands that declined below 0.9× — netting, union-free
    // decimal recompute, and a brand-cardinality YoY join.
    sqlBoth(
      "tpcds_q75_yoy_net_decline",
      Seq("lineitem", "part"),
      """
        WITH rets AS (
          SELECT l_orderkey AS ord, l_partkey AS part, l_quantity AS rqty
          FROM lineitem WHERE l_returnflag = 'R'),
        net AS (
          SELECT YEAR(s.l_shipdate) AS yr, p_brand AS brand,
                 CAST(SUM(CAST((s.l_quantity - COALESCE(r.rqty, 0)) *
                          s.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
          FROM lineitem s
          JOIN part ON s.l_partkey = p_partkey
          LEFT JOIN rets r ON s.l_orderkey = r.ord AND s.l_partkey = r.part
          WHERE s.l_returnflag = 'N'
          GROUP BY YEAR(s.l_shipdate), p_brand)
        SELECT c.brand AS brand, c.yr AS yr,
               CAST(CAST(ROUND(p.sales, 2) AS DECIMAL(18,2)) AS DOUBLE) AS prev_sales,
               CAST(CAST(ROUND(c.sales, 2) AS DECIMAL(18,2)) AS DOUBLE) AS curr_sales,
               CAST(CAST(ROUND(c.sales - p.sales, 2) AS DECIMAL(18,2)) AS DOUBLE) AS diff
        FROM net c JOIN net p ON c.brand = p.brand AND c.yr = p.yr + 1
        WHERE c.sales < 0.9 * p.sales
        ORDER BY diff, brand, yr LIMIT 100""")
  )
}
