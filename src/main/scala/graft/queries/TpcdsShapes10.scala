package graft.queries

import graft.{QueryDef, Tables}

/** Tenth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/tests/optimizers/tpcds/queries/): four plan features
  * waves 1–9 still don't exercise —
  *
  *  - q6: the correlated scalar-average gate sits on the DIM side
  *    (each part against 1.2× its type's average) with the fact joined
  *    after — decorrelation happens before the fact scan ever sees the
  *    predicate, so the filter arrives at the join as a reduced dim;
  *  - q24: a scalar subquery aggregating the SAME CTE it gates (keep
  *    (customer, part) totals above 3× the average total) — the CTE's
  *    aggregate output feeds both the filter's scalar and the rows;
  *  - q37/q82: dim restricted by an IN-list plus a value band, then
  *    semi-joined against a quantity-gated fact — item-availability
  *    lookup, dim-cardinality output;
  *  - q13/q85's residual feature: a disjunction whose arms mix columns
  *    from BOTH join sides (customer segment/balance × lineitem
  *    quantity) — unpushable below the join, must stay one residual
  *    filter over the joined stream, never a per-arm re-join.
  *
  * Averages in gates are computed as exact-decimal sum / count on both
  * engines, so threshold comparisons can never flip on float summation
  * order. Scale notes inline per query.
  */
object TpcdsShapes10 {

  private def sqlBoth(name: String, tables: Seq[String], sql: String): QueryDef =
    QueryDef(
      name,
      (s, dir) => {
        tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

  val defs: Seq[QueryDef] = Seq(

    // q6 shape: parts priced above 1.03× their type's average (correlated
    // scalar on the dim), then the fact joined to count per supplier
    // nation. The correlation decorrelates into one per-type aggregate
    // over the part dim — dim-cardinality work — and the fact joins an
    // already-reduced part set.
    sqlBoth(
      "tpcds_q6_dim_corr_avg",
      Seq("lineitem", "part", "supplier", "nation"),
      """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_retailprice > 1.03 * (
          SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM part p2 WHERE p2.p_type = part.p_type)
        GROUP BY n_name
        ORDER BY n_name"""),

    // q24 shape: (customer, part) totals kept above 3× the average of
    // ALL such totals — the scalar subquery re-aggregates the gated
    // CTE's own output. Both the scalar and the kept rows reuse one
    // customer×part-cardinality aggregate; the threshold is an exact
    // decimal mean so the > can never flip on summation order.
    sqlBoth(
      "tpcds_q24_scalar_agg_gate",
      Seq("lineitem", "orders"),
      """
        WITH pc AS (
          SELECT o_custkey AS cust, l_partkey AS part,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey, l_partkey)
        SELECT cust, part,
               CAST(CAST(ROUND(tot, 2) AS DECIMAL(18,2)) AS DOUBLE) AS tot
        FROM pc
        WHERE tot > 3 * (
          SELECT CAST(SUM(CAST(tot AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM pc)
        ORDER BY tot DESC, cust, part LIMIT 100"""),

    // q37/q82 shape: item availability — parts in a price band and a
    // size IN-list, semi-joined against high-quantity lines. Output is
    // dim-cardinality; the EXISTS is one orderless semi-join on
    // partkey, never a fact-side distinct.
    sqlBoth(
      "tpcds_q82_band_semi_parts",
      Seq("part", "lineitem"),
      """
        SELECT p_partkey, p_name,
               CAST(CAST(ROUND(p_retailprice, 2) AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM part
        WHERE p_retailprice BETWEEN 950 AND 980
          AND p_size IN (5, 10, 15, 20, 25)
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity > 45)
        ORDER BY p_partkey LIMIT 100"""),

    // q13/q85 residual shape: disjunction arms mixing customer
    // (segment, balance) with lineitem (quantity) columns — the OR
    // cannot push below the join on either side, so it must run as ONE
    // residual filter over the joined rows; a plan that re-joins per
    // arm and unions would scan the fact three times.
    sqlBoth(
      "tpcds_q85_multitable_disjunct",
      Seq("lineitem", "orders", "customer"),
      """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE (c_mktsegment = 'BUILDING'
                 AND l_quantity BETWEEN 1 AND 15
                 AND c_acctbal BETWEEN 0 AND 3000)
           OR (c_mktsegment = 'MACHINERY'
                 AND l_quantity BETWEEN 16 AND 35
                 AND c_acctbal BETWEEN 2000 AND 7000)
           OR (c_mktsegment = 'AUTOMOBILE'
                 AND l_quantity BETWEEN 36 AND 50
                 AND c_acctbal BETWEEN 5000 AND 10000)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
  )
}
