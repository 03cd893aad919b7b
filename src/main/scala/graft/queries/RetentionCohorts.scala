package graft.queries

import graft.{QueryDef, Tables}
import graft.aggregates.RetentionMatrix
import org.apache.spark.sql.functions._

/** Cohort-retention matrix queries (retention2 / retention4). Raw events
  * reduce to one row per user (day-index arrays) in a distributed hash
  * aggregate; the matrix aggregate's state is a fixed few-hundred-cell
  * Long array, so map-side combine ships counters, not users.
  */
object RetentionCohorts {

  val defs: Seq[QueryDef] = Seq(

    // retention2 over a 7-day window: diagonal = signup cohort per day,
    // cell (i,j>i) = users who signed up on day i and purchased on day j.
    QueryDef(
      "retention2_matrix",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .as("dy"),
            col("event_type"))
          .filter(col("dy").between(0, 6) &&
            col("event_type").isin("signup", "purchase"))
          .groupBy("user_id")
          .agg(
            collect_set(when(col("event_type") === "signup", col("dy")))
              .as("startDays"),
            collect_set(when(col("event_type") === "purchase", col("dy")))
              .as("endDays"))
          .agg(RetentionMatrix.retention2(7)(col("startDays"), col("endDays"))
            .as("m"))
          .select(explode(col("m")).as("c"))
          .select(col("c.i").as("start_day"), col("c.j").as("end_day"),
            col("c.users").as("users"))
          .orderBy("start_day", "end_day")
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, event_type,
            CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS dy
          FROM events
          WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'
            AND event_type IN ('signup','purchase')),
        s AS (SELECT user_id, dy FROM e WHERE event_type = 'signup'),
        p AS (SELECT user_id, dy FROM e WHERE event_type = 'purchase'),
        grid AS (SELECT CAST(i.i AS INTEGER) AS i, CAST(j.j AS INTEGER) AS j
                 FROM (SELECT UNNEST(RANGE(0, 7)) AS i) i,
                      (SELECT UNNEST(RANGE(0, 7)) AS j) j
                 WHERE j.j >= i.i),
        diag AS (SELECT dy AS i, COUNT(*) AS c FROM s GROUP BY dy),
        ret AS (SELECT s.dy AS i, p.dy AS j, COUNT(*) AS c
                FROM s JOIN p ON p.user_id = s.user_id AND p.dy > s.dy
                GROUP BY 1, 2)
        SELECT grid.i AS start_day, grid.j AS end_day,
          CAST(CASE WHEN grid.i = grid.j THEN COALESCE(diag.c, 0)
                    ELSE COALESCE(ret.c, 0) END AS BIGINT) AS users
        FROM grid
          LEFT JOIN diag ON diag.i = grid.i AND grid.i = grid.j
          LEFT JOIN ret ON ret.i = grid.i AND ret.j = grid.j
        ORDER BY start_day, end_day""")),

    // retention4 over a 14-day span, 7-day window: cohorts anchored at
    // each user's FIRST signup day; k=0 = cohort size, k>0 = users who
    // clicked exactly k days after their first signup.
    QueryDef(
      "retention4_cohorts",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .as("dy"),
            col("event_type"))
          .filter(col("dy").between(0, 13) &&
            col("event_type").isin("signup", "click"))
          .groupBy("user_id")
          .agg(
            collect_set(when(col("event_type") === "signup", col("dy")))
              .as("startDays"),
            collect_set(when(col("event_type") === "click", col("dy")))
              .as("endDays"))
          .agg(RetentionMatrix.retention4(7, 14)(col("startDays"), col("endDays"))
            .as("m"))
          .select(explode(col("m")).as("c"))
          .select(col("c.i").as("cohort_day"), col("c.j").as("day_offset"),
            col("c.users").as("users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, event_type,
            CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS dy
          FROM events
          WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-14'
            AND event_type IN ('signup','click')),
        f AS (SELECT user_id, MIN(dy) AS fd FROM e
              WHERE event_type = 'signup' GROUP BY user_id),
        r AS (SELECT user_id, dy FROM e WHERE event_type = 'click'),
        grid AS (SELECT CAST(i.i AS INTEGER) AS fd, CAST(k.k AS INTEGER) AS k
                 FROM (SELECT UNNEST(RANGE(0, 14)) AS i) i,
                      (SELECT UNNEST(RANGE(0, 7)) AS k) k),
        coh AS (SELECT fd, COUNT(*) AS c FROM f GROUP BY fd),
        ret AS (SELECT f.fd, CAST(r.dy - f.fd AS INTEGER) AS k, COUNT(*) AS c
                FROM f JOIN r ON r.user_id = f.user_id
                  AND r.dy > f.fd AND r.dy < f.fd + 7
                GROUP BY 1, 2)
        SELECT grid.fd AS cohort_day, grid.k AS day_offset,
          CAST(CASE WHEN grid.k = 0 THEN COALESCE(coh.c, 0)
                    ELSE COALESCE(ret.c, 0) END AS BIGINT) AS users
        FROM grid
          LEFT JOIN coh ON coh.fd = grid.fd AND grid.k = 0
          LEFT JOIN ret ON ret.fd = grid.fd AND ret.k = grid.k
        ORDER BY cohort_day, day_offset"""))
  )
}
