package graft.queries

import graft.{QueryDef, Tables}

/** Eleventh TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/tests/optimizers/tpcds/queries/): the last three
  * feature COMBINATIONS waves 1–10 don't exercise —
  *
  *  - q2: channels normalized through UNION ALL, pivoted to per-week
  *    totals, then the week frame self-joined one year forward — the
  *    union must collapse into the aggregate (one pass per arm), and
  *    the YoY join runs at week cardinality;
  *  - q72: a date-OFFSET non-equi join chain — each purchase matched
  *    to the same user's clicks within the following three days. The
  *    equi part (user) carries the shuffle; the interval is a residual
  *    on the sorted stream, so per-user fan-out stays bounded by the
  *    window, never quadratic;
  *  - q84: a pure dim-chain lookup (customer → nation → region)
  *    concatenated into a display id, band-filtered — both dims
  *    broadcast; the chain must not introduce a shuffle.
  */
object TpcdsShapes11 {

  private def sqlBoth(name: String, tables: Seq[String], sql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

  val defs: Seq[QueryDef] = Seq(

    // q2 shape: two priority channels unioned, per-(year, week) totals,
    // week frame joined against itself one year forward. Arms are
    // pushed-filter scans; the YoY join input is week-cardinality.
    sqlBoth(
      "tpcds_q2_union_week_shift",
      Seq("orders"),
      """
        WITH u AS (
          SELECT YEAR(o_orderdate) AS yr, WEEKOFYEAR(o_orderdate) AS wk,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS p
          FROM orders WHERE o_orderpriority LIKE '1%'
          UNION ALL
          SELECT YEAR(o_orderdate), WEEKOFYEAR(o_orderdate),
                 CAST(o_totalprice AS DECIMAL(18,2))
          FROM orders WHERE o_orderpriority LIKE '5%'),
        wkt AS (
          SELECT yr, wk, CAST(SUM(p) AS DOUBLE) AS tot
          FROM u GROUP BY yr, wk)
        SELECT a.wk AS wk,
               CAST(CAST(ROUND(a.tot, 2) AS DECIMAL(18,2)) AS DOUBLE) AS tot_this,
               CAST(CAST(ROUND(b.tot, 2) AS DECIMAL(18,2)) AS DOUBLE) AS tot_next,
               CAST(CAST(ROUND(b.tot / a.tot, 6) AS DECIMAL(18,6)) AS DOUBLE) AS yoy
        FROM wkt a JOIN wkt b ON a.wk = b.wk AND b.yr = a.yr + 1
        WHERE a.yr = 1996
        ORDER BY wk"""),

    // q72 shape: date-offset interval join — purchases to the same
    // user's clicks in the next three days. Shuffle key is the user;
    // the time window is a join residual, so the pair count per user
    // is bounded by activity inside the window.
    sqlBoth(
      "tpcds_q72_date_offset_join",
      Seq("events"),
      """
        SELECT p.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS pairs
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 3 DAY
        GROUP BY p.user_id
        ORDER BY user_id"""),

    // q84 shape: dim-chain display id — customer joined through nation
    // to region, concatenated; both dims broadcast, zero fact-side
    // shuffles.
    sqlBoth(
      "tpcds_q84_dim_chain_concat",
      Seq("customer", "nation", "region"),
      """
        SELECT c_custkey,
               c_name || ', ' || n_name || ', ' || r_name AS customer_id
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_acctbal BETWEEN 9000 AND 9500
        ORDER BY c_custkey LIMIT 100""")
  )
}
