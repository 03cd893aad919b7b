package graft.queries

import graft.{QueryDef, Tables}
import graft.aggregates.BitmapExpr
import org.apache.spark.sql.functions._

/** Bitmap expression-calculation queries: segment algebra over per-tag
  * user bitmaps via expression strings (reference
  * AggregateFunctionBitmapExpressionCalculation.h bitmapCount /
  * bitmapMultiCount / bitmapExtract). Oracles compute the same set algebra
  * from exact per-user membership flags.
  */
object SegmentAlgebra {

  val defs: Seq[QueryDef] = Seq(

    // bitmapMultiCount over four expression strings sharing one pruned
    // tag→bitmap state; fixed-width output projected to scalar columns.
    QueryDef(
      "bitmap_count_expression",
      (s, dir) => {
        val mc = BitmapExpr.multiCount(
          "click & purchase",
          "click | view",
          "( click & purchase ) ~ error",
          "signup , view")
        Tables(s, dir, "events")
          .agg(mc(col("event_type"), col("user_id")).as("c"))
          .select(col("c")(0).as("n_click_and_purchase"),
                  col("c")(1).as("n_click_or_view"),
                  col("c")(2).as("n_cp_not_error"),
                  col("c")(3).as("n_signup_or_view"))
      },
      Some("""
        WITH s AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
            MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
            MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS g
          FROM events GROUP BY user_id)
        SELECT
          CAST(SUM(c * p) AS BIGINT) AS n_click_and_purchase,
          CAST(SUM(CASE WHEN c = 1 OR v = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_click_or_view,
          CAST(SUM(CASE WHEN c = 1 AND p = 1 AND e = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cp_not_error,
          CAST(SUM(CASE WHEN g = 1 OR v = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_signup_or_view
        FROM s""")),

    // bitmapExtract over day-scoped tags (`<type>_d<day>` — tags are
    // arbitrary strings, so segments can encode time slices): users who
    // purchased AND signed up on day 3 but did not click that day,
    // posexploded to one user per row for the gate. Day-scoping keeps the
    // segment selective — every user has every event type over the full
    // month, so whole-month algebra degenerates to all-or-nothing sets.
    QueryDef(
      "bitmap_extract_expression",
      (s, dir) => {
        val ex = BitmapExpr.extract("( purchase_d3 & signup_d3 ) ~ click_d3")
        Tables(s, dir, "events")
          .withColumn("tag",
            concat(col("event_type"), lit("_d"),
              datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))))
          .agg(ex(col("tag"), col("user_id")).as("u"))
          .select(posexplode(col("u")).as(Seq("pos", "user_id")))
          .select(col("pos"), col("user_id"))
          .orderBy(col("pos"))
      },
      Some("""
        WITH d3 AS (SELECT user_id, event_type FROM events
                    WHERE CAST(ts AS DATE) = DATE '2024-01-04'),
        s AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS g,
            MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
          FROM d3 GROUP BY user_id),
        m AS (SELECT user_id FROM s WHERE p = 1 AND g = 1 AND c = 0)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS INTEGER) AS pos,
               user_id
        FROM m ORDER BY pos"""))
  )
}
