package graft.queries

import graft.{QueryDef, Tables}
import graft.aggregates.{BitmapAggregates, BitmapLevels}
import org.apache.spark.sql.functions._

/** Keyed-bitmap lifecycle queries: funnel-level dedup (bitmapMaxLevel) and
  * day-over-day audience churn (bitmapColumnDiff). Raw events reduce to one
  * compressed bitmap per key in a distributed hash aggregate; the final
  * single-group pass combines only #keys small bitmaps, so the shape holds
  * at 100 TB (shuffle payload = compressed user sets, not user rows).
  */
object BitmapLifecycle {

  val defs: Seq[QueryDef] = Seq(

    // bitmapMaxLevel over one day's funnel events: view=1 < click=2 <
    // purchase=3; each user counts only at the deepest level reached that
    // day. Day-scoped because over the full month every user reaches every
    // level (see SegmentAlgebra's day-scoping note).
    QueryDef(
      "bitmap_max_level",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .where(to_date(col("ts")) === lit("2024-01-05").cast("date") &&
            col("event_type").isin("view", "click", "purchase"))
          .withColumn("level",
            when(col("event_type") === "view", 1L)
              .when(col("event_type") === "click", 2L)
              .otherwise(3L))
        ev.groupBy("level")
          .agg(BitmapAggregates.groupBitmap(col("user_id")).as("bm"))
          .agg(BitmapLevels.maxLevel(col("level"), col("bm")).as("r"))
          .select(explode(col("r")).as("lu"))
          .select(col("lu.level").as("level"), col("lu.users").as("users"))
          .orderBy("level")
      },
      Some("""
        WITH f AS (SELECT user_id,
            CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 ELSE 3 END AS lvl
          FROM events
          WHERE CAST(ts AS DATE) = DATE '2024-01-05'
            AND event_type IN ('view','click','purchase')),
        m AS (SELECT user_id, MAX(lvl) AS lvl FROM f GROUP BY user_id),
        lv AS (SELECT DISTINCT lvl FROM f)
        SELECT CAST(lv.lvl AS BIGINT) AS level,
               CAST(COALESCE(COUNT(m.user_id), 0) AS BIGINT) AS users
        FROM lv LEFT JOIN m ON m.lvl = lv.lvl
        GROUP BY lv.lvl ORDER BY level""")),

    // bitmapColumnDiff forward/step=1 over daily active-user bitmaps:
    // per day, users active that day but gone the next (churn). The last
    // day has no successor and emits 0, like the reference's empty bitmap.
    QueryDef(
      "bitmap_column_diff",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"), col("user_id"))
          .groupBy("day")
          .agg(BitmapAggregates.groupBitmap(col("user_id")).as("bm"))
          .agg(BitmapLevels.columnDiff("forward", 1)(col("day"), col("bm")).as("r"))
          .select(explode(col("r")).as("kd"))
          .select(col("kd.key").as("day"),
                  element_at(col("kd.diffs"), 1).as("lost"))
          .orderBy("day")
      },
      Some("""
        WITH ud AS (SELECT DISTINCT
            CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
            user_id
          FROM events),
        days AS (SELECT day, LEAD(day) OVER (ORDER BY day) AS nxt
                 FROM (SELECT DISTINCT day FROM ud)),
        j AS (SELECT d.day, a.user_id, d.nxt
              FROM days d JOIN ud a ON a.day = d.day)
        SELECT j.day,
          CAST(SUM(CASE WHEN j.nxt IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM ud b WHERE b.user_id = j.user_id AND b.day = j.nxt)
            THEN 1 ELSE 0 END) AS BIGINT) AS lost
        FROM j GROUP BY j.day ORDER BY j.day""")),

    // bitmapColumnOr/And/Xor/Cardinality/Has (reference
    // AggregateFunctionBitmapLogic.cpp:94-98) + bitmapFromColumn
    // (AggregateFunctionBitmapFromColumn.cpp): one compressed bitmap per
    // (type, day), then the per-type fold combines #days tiny bitmaps —
    // OR = any-day audience, AND = every-day regulars, XOR = odd-day
    // parity, Has = membership probe. Set ops are commutative/associative
    // so distributed merge order is immaterial.
    QueryDef(
      "bitmap_column_logic",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .where(to_date(col("ts")).between(
            lit("2024-01-01").cast("date"), lit("2024-01-07").cast("date")))
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
          .groupBy("event_type", "day")
          .agg(BitmapAggregates.groupBitmap(col("user_id")).as("bm"))
        daily.groupBy("event_type")
          .agg(
            BitmapAggregates.bitmapColumnCardinality(col("bm")).as("users_any_day"),
            BitmapAggregates.bitmapCardinality(
              BitmapAggregates.bitmapColumnAnd(col("bm"))).as("users_every_day"),
            BitmapAggregates.bitmapCardinality(
              BitmapAggregates.bitmapColumnXor(col("bm"))).as("users_odd_days"),
            BitmapAggregates.bitmapColumnHas(col("bm"), lit(17L)).as("has_user_17"))
          .orderBy("event_type")
      },
      Some("""
        WITH ud AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
          FROM events
          WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'),
        nd AS (SELECT event_type, COUNT(DISTINCT day) AS ndays FROM ud GROUP BY 1),
        per_user AS (SELECT event_type, user_id, COUNT(DISTINCT day) AS d
                     FROM ud GROUP BY 1, 2)
        SELECT p.event_type,
          CAST(COUNT(*) AS BIGINT) AS users_any_day,
          CAST(SUM(CASE WHEN p.d = nd.ndays THEN 1 ELSE 0 END) AS BIGINT) AS users_every_day,
          CAST(SUM(CASE WHEN p.d % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS users_odd_days,
          bool_or(p.user_id = 17) AS has_user_17
        FROM per_user p JOIN nd ON nd.event_type = p.event_type
        GROUP BY p.event_type ORDER BY p.event_type"""))
  )
}
