package graft.queries

import graft.{QueryDef, Tables}

/** Seventh TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/tests/optimizers/tpcds/queries/, harness
  * gtest_base_tpcds_plan_test.h): the five plan features the round-6
  * verdict called out as untested — q14's three-channel INTERSECT
  * feeding a gated aggregate, q51's window-over-FULL-OUTER-JOIN, q64's
  * multi-round self-join chain over a HAVING-gated item set, q70's
  * rank-within-rollup-parent with a windowed-subquery gate, q95's
  * IN-chain reachability over a fact self-join — plus q97's FULL OUTER
  * channel overlap counts and q87's chained EXCEPT.
  *
  * Channels are synthesized the way the existing waves do it
  * (l_suppkey % 3 → air/sea/land; events click/purchase for web/store).
  * Each query is ANSI SQL that runs VERBATIM on both Spark and the
  * DuckDB oracle — dialect parity is part of the point.
  *
  * Scale notes: every INTERSECT/EXCEPT arm and DISTINCT-pair set is a
  * key-only shuffle (no fact payload); the q95 self-join shuffles on
  * l_orderkey once and reuses the CTE for both IN gates; q51/q97 full
  * outers join already-aggregated per-(item,day) frames, so the join
  * input is the group count, not the event count; q64 joins part
  * (broadcast-size dim) before grouping so the fact scan is pruned to
  * three columns.
  */
object TpcdsShapes7 {

  /** A query whose Spark implementation and DuckDB oracle are the same
    * ANSI SQL text over the same registered views.
    */
  private def sqlBoth(name: String, tables: Seq[String], sql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

  val defs: Seq[QueryDef] = Seq(

    // q14 shape: items sold through ALL THREE channels (two INTERSECTs of
    // per-channel brand sets) gate a per-channel aggregate that must also
    // beat the prior-years average (scalar subquery in HAVING).
    sqlBoth(
      "tpcds_q14_cross_channel_intersect",
      Seq("lineitem", "part"),
      """
        WITH li AS (
          SELECT CASE WHEN l_suppkey % 3 = 0 THEN 'air'
                      WHEN l_suppkey % 3 = 1 THEN 'sea'
                      ELSE 'land' END AS channel,
                 l_partkey, l_quantity, l_extendedprice,
                 YEAR(l_shipdate) AS yr
          FROM lineitem),
        cross_items AS (
          SELECT p_brand FROM li JOIN part ON l_partkey = p_partkey
          WHERE channel = 'air' AND yr BETWEEN 1995 AND 1997
          INTERSECT
          SELECT p_brand FROM li JOIN part ON l_partkey = p_partkey
          WHERE channel = 'sea' AND yr BETWEEN 1995 AND 1997
          INTERSECT
          SELECT p_brand FROM li JOIN part ON l_partkey = p_partkey
          WHERE channel = 'land' AND yr BETWEEN 1995 AND 1997),
        avg_sales AS (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS average_sales
          FROM li WHERE yr BETWEEN 1995 AND 1996)
        SELECT channel, p_brand,
          CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
        FROM li JOIN part ON l_partkey = p_partkey
        WHERE yr = 1997 AND p_brand IN (SELECT p_brand FROM cross_items)
        GROUP BY channel, p_brand
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               > (SELECT average_sales FROM avg_sales)
        ORDER BY channel, p_brand"""),

    // q51 shape: per-channel cumulative daily sales frames, FULL OUTER
    // JOINed on (item, day), then running MAX windows over the coalesced
    // stream — rows where the web cumulative overtakes the store one.
    sqlBoth(
      "tpcds_q51_fullouter_cumwindow",
      Seq("events"),
      """
        WITH web AS (
          SELECT user_id % 100 AS item_sk, CAST(ts AS DATE) AS d,
                 SUM(CAST(value AS DECIMAL(18,6))) AS s
          FROM events WHERE event_type = 'click' GROUP BY user_id % 100, CAST(ts AS DATE)),
        web_v1 AS (
          SELECT item_sk, d,
            CAST(SUM(s) OVER (PARTITION BY item_sk ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cume_sales
          FROM web),
        store AS (
          SELECT user_id % 100 AS item_sk, CAST(ts AS DATE) AS d,
                 SUM(CAST(value AS DECIMAL(18,6))) AS s
          FROM events WHERE event_type = 'purchase' GROUP BY user_id % 100, CAST(ts AS DATE)),
        store_v1 AS (
          SELECT item_sk, d,
            CAST(SUM(s) OVER (PARTITION BY item_sk ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cume_sales
          FROM store),
        x AS (
          SELECT COALESCE(w.item_sk, st.item_sk) AS item_sk,
                 COALESCE(w.d, st.d) AS d,
                 w.cume_sales AS web_sales,
                 st.cume_sales AS store_sales
          FROM web_v1 w FULL OUTER JOIN store_v1 st
            ON w.item_sk = st.item_sk AND w.d = st.d),
        y AS (
          SELECT item_sk, d, web_sales, store_sales,
            MAX(web_sales) OVER (PARTITION BY item_sk ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
            MAX(store_sales) OVER (PARTITION BY item_sk ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
          FROM x)
        SELECT item_sk, d, web_sales, store_sales, web_cumulative, store_cumulative
        FROM y WHERE web_cumulative > store_cumulative
        ORDER BY item_sk, d LIMIT 100"""),

    // q64 shape: a HAVING-gated item set (sales must dwarf refunds) feeds
    // a per-(brand, year) rollup that is then self-joined year against
    // year+1 with a cross-year count condition — the multi-round chain.
    sqlBoth(
      "tpcds_q64_selfjoin_chain",
      Seq("lineitem", "part"),
      """
        WITH cs_ui AS (
          SELECT p_brand
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand
          HAVING SUM(CAST(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice
                               ELSE 0 END AS DECIMAL(18,2)))
               > 2 * SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice
                                   ELSE 0 END AS DECIMAL(18,2)))),
        cross_sales AS (
          SELECT p_brand AS brand, YEAR(l_shipdate) AS yr,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST('1.00' AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2))))
                   AS DOUBLE) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand IN (SELECT p_brand FROM cs_ui)
          GROUP BY p_brand, YEAR(l_shipdate))
        SELECT cs1.brand AS brand,
               cs1.cnt AS cnt1, cs2.cnt AS cnt2,
               cs1.qty AS qty1, cs2.qty AS qty2,
               cs1.rev AS rev1, cs2.rev AS rev2
        FROM cross_sales cs1 JOIN cross_sales cs2
          ON cs1.brand = cs2.brand AND cs1.yr = 1996 AND cs2.yr = 1997
         AND cs2.cnt <= cs1.cnt
        ORDER BY brand"""),

    // q70 shape: revenue ROLLUP over (region, nation) restricted to the
    // top-3 nations per region (windowed-subquery gate), with
    // rank-within-parent partitioned by the GROUPING level.
    sqlBoth(
      "tpcds_q70_rollup_rank_parent",
      Seq("orders", "customer", "nation", "region"),
      """
        WITH rev AS (
          SELECT r_name, n_name,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rv
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name),
        gate AS (
          SELECT n_name FROM (
            SELECT n_name,
                   RANK() OVER (PARTITION BY r_name ORDER BY rv DESC, n_name) AS ranking
            FROM rev) t
          WHERE ranking <= 3),
        agg AS (
          SELECT r_name, n_name,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sum,
            CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy,
            CAST(GROUPING(n_name) AS INT) AS gn
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE n_name IN (SELECT n_name FROM gate)
          GROUP BY ROLLUP(r_name, n_name))
        SELECT total_sum, r_name, n_name, lochierarchy,
          CAST(RANK() OVER (
            PARTITION BY lochierarchy, CASE WHEN gn = 0 THEN r_name END
            ORDER BY total_sum DESC, n_name ASC NULLS FIRST) AS INT) AS rank_within_parent
        FROM agg
        ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST,
                 rank_within_parent, n_name ASC NULLS FIRST"""),

    // q95 shape: reachability gates — orders that shipped lines from at
    // least two suppliers (fact self-join CTE) AND had a returned line
    // from that same multi-supplier set, both as IN chains.
    sqlBoth(
      "tpcds_q95_exists_chain",
      Seq("orders", "customer", "lineitem"),
      """
        WITH ws_wh AS (
          SELECT DISTINCT l1.l_orderkey AS l_orderkey
          FROM lineitem l1 JOIN lineitem l2
            ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
        SELECT COUNT(DISTINCT o_orderkey) AS order_count,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey = 5
          AND YEAR(o_orderdate) = 1996 AND MONTH(o_orderdate) <= 2
          AND o_orderkey IN (SELECT l_orderkey FROM ws_wh)
          AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R'
                               AND l_orderkey IN (SELECT l_orderkey FROM ws_wh))"""),

    // q97 shape: FULL OUTER JOIN of two channels' DISTINCT
    // (customer, item) sets → exclusive/both overlap counts in one row.
    sqlBoth(
      "tpcds_q97_fullouter_counts",
      Seq("events"),
      """
        WITH ssci AS (
          SELECT DISTINCT user_id AS customer_sk, event_id % 50 AS item_sk
          FROM events WHERE event_type = 'purchase'),
        csci AS (
          SELECT DISTINCT user_id AS customer_sk, event_id % 50 AS item_sk
          FROM events WHERE event_type = 'click')
        SELECT
          CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL AND c.customer_sk IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
          CAST(SUM(CASE WHEN s.customer_sk IS NULL AND c.customer_sk IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
          CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL AND c.customer_sk IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
        FROM ssci s FULL OUTER JOIN csci c
          ON s.customer_sk = c.customer_sk AND s.item_sk = c.item_sk"""),

    // q87 shape: chained EXCEPT DISTINCT — customers in channel 1 but in
    // neither channel 2 nor channel 3.
    sqlBoth(
      "tpcds_q87_except_channels",
      Seq("orders"),
      """
        SELECT CAST(COUNT(*) AS BIGINT) AS num_customers FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '2%'
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '3%') t""")
  )
}
