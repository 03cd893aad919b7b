package graft.queries

import graft.{QueryDef, Tables}

/** Round-6 continuation wave: countByGranularity and the -Stack
  * combinator — the last two "observably plain group-by" adjudicated
  * skips from VERDICT r5, now implemented as first-class aggregates.
  *
  * Scale notes: countByGranularity's state is the distinct-value count
  * map (bounded by NDV, not rows); -Stack lowers to one CreateArray of
  * conditional aggregates over widening prefixes — a single hash
  * aggregate pass, no explode before the final posexplode of the small
  * per-group array.
  */
object CoverageWave9 {

  val defs: Seq[QueryDef] = Seq(

    // countByGranularity with granularity=1 (every row its own granule)
    // — the deterministic configuration: per-value exact row counts,
    // emitted value-sorted and posexploded per the gate convention.
    // Block semantics at granularity>1 are unit-traced in
    // CountByGranularitySpec (layout-dependent in the reference too).
    QueryDef(
      "count_by_granularity",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type, g.value AS bucket, g.cnt AS cnt
          FROM (SELECT event_type, countByGranularity(1, user_id % 50) AS arr
                FROM events GROUP BY event_type) t
          LATERAL VIEW explode(arr) ex AS g
          ORDER BY event_type, bucket""")
      },
      Some("""
        SELECT event_type, user_id % 50 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // sumStack(0, 28, 7)(v, day): cumulative weekly revenue curve per
    // event type — element i is the sum over days [0, min((i+1)*7, 28)),
    // keyed by week start, the stacked-graph shape.
    QueryDef(
      "stack_graph_cumulative",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type, e.ts AS week_start, CAST(e.val AS BIGINT) AS cum_value
          FROM (SELECT event_type,
                  sumStack(0, 28, 7, CAST(FLOOR(value * 100) AS BIGINT),
                    datediff(CAST(ts AS DATE), DATE '2024-01-01')) AS arr
                FROM events GROUP BY event_type) t
          LATERAL VIEW explode(arr) ex AS e
          ORDER BY event_type, week_start""")
      },
      Some("""
        WITH d AS (SELECT event_type,
            CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
            CAST(FLOOR(value * 100) AS BIGINT) AS v
          FROM events),
        weeks AS (SELECT * FROM (VALUES (0), (7), (14), (21)) AS w(ts)),
        types AS (SELECT DISTINCT event_type FROM d)
        SELECT t.event_type, CAST(w.ts AS BIGINT) AS week_start,
          CAST((SELECT COALESCE(SUM(v), 0) FROM d
                WHERE d.event_type = t.event_type
                  AND d.day >= 0 AND d.day < LEAST(w.ts + 7, 28)) AS BIGINT) AS cum_value
        FROM types t CROSS JOIN weeks w
        ORDER BY t.event_type, week_start""")),

    // stochasticLinearRegression + evalMLMethod (reference
    // AggregateFunctionMLMethod.cpp:111): per-type mini-batch SGD over a
    // synthetic linear target; mini-batch training is arrival-order-
    // dependent (in the reference too), so the gate is rows-only — the
    // exact single-stream algorithm is differentially gated in
    // StochasticRegressionSpec.
    QueryDef(
      "ml_stochastic_regression",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          WITH f AS (SELECT event_type,
              (event_id % 97) / 97.0 AS x1, (user_id % 89) / 89.0 AS x2,
              2.0 * ((event_id % 97) / 97.0) - ((user_id % 89) / 89.0) + 0.5 AS y
            FROM events),
          m AS (SELECT event_type,
              stochasticLinearRegression(0.2, 0.0, 20, 'SGD', y, x1, x2) AS w,
              COUNT(*) AS n
            FROM f GROUP BY event_type)
          SELECT event_type, size(w) AS n_params, n,
            evalMLMethod(w, 0.5, 0.5) IS NOT NULL AS scored
          FROM m ORDER BY event_type""")
      },
      None)
  )
}
