package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-5 wave: the reference's per-level funnel-breakdown family
  * (reference /root/reference/src/AggregateFunctions/
  * AggregateFunctionFinderFunnel.h — per-watch-slot funnel levels — and
  * AggregateFunctionFunnelRep.h — level arrays folded to per-slot
  * per-level user counts), plus the funnel-anchored pathSplit and cohort
  * retention variants that build on the same per-user event machinery.
  *
  * Scale shape shared by every query here: one shuffle on user_id into a
  * packed-buffer behavioral aggregate (concatenation merge, map-side
  * combine), then a small slot/level-keyed re-aggregation. No self-joins
  * of the event stream anywhere.
  */
object FunnelFamily {

  private val DayUs = 86400L * 1000000
  /** 2024-01-01 00:00:00 UTC in epoch-µs — the events table's first day. */
  private val WatchStartUs = 1704067200000000L
  private val WatchDays = 30

  private def steppedEvents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "events")
      .withColumn("step",
        when(col("event_type") === "signup", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).otherwise(0))
      .filter(col("step") > 0)

  val defs: Seq[QueryDef] = Seq(

    // finderFunnel + funnelRep: per-day funnel levels (chain must START in
    // the day; completion within a 1-day window may cross midnight —
    // the reference's "second chance" semantics), folded to per-day
    // per-level user counts (funnelRep's output matrix, one row per slot).
    QueryDef(
      "funnel_levels_breakdown",
      (s, dir) => {
        val ff = graft.aggregates.FinderFunnelAgg
          .finderFunnel(WatchStartUs, DayUs, WatchDays, DayUs, 3) _
        steppedEvents(s, dir)
          .groupBy(col("user_id"))
          .agg(ff(unix_micros(col("ts")), col("step")).as("levels"))
          .select(col("user_id"), posexplode(col("levels")).as(Seq("slot", "lvl")))
          .filter(col("lvl") > 0)
          .groupBy(col("slot"))
          .agg(count(lit(1)).as("reached_1"),
               count(when(col("lvl") >= 2, 1)).as("reached_2"),
               count(when(col("lvl") >= 3, 1)).as("reached_3"))
          .orderBy(col("slot"))
      },
      // Exact oracle: per signup event, the earliest chain completion is
      // cp_next = min over clicks at-or-after it of (earliest purchase
      // at-or-after the click) — two window sweeps, no triple self-join
      // (same linearization as the funnel_signup_click_purchase oracle).
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'click' THEN us END) OVER w AS c_next,
                MIN(CASE WHEN event_type = 'click' THEN p_next END) OVER w AS cp_next
              FROM x
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        lv AS (SELECT user_id,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cp_next IS NOT NULL AND cp_next - us <= 86400000000 THEN 3
                      WHEN c_next IS NOT NULL AND c_next - us <= 86400000000 THEN 2
                      ELSE 1 END AS lvl
               FROM y WHERE event_type = 'signup'),
        m AS (SELECT user_id, slot, MAX(lvl) AS lvl FROM lv
              WHERE slot >= 0 AND slot < 30 GROUP BY 1, 2)
        SELECT slot, COUNT(*) AS reached_1,
          COUNT(CASE WHEN lvl >= 2 THEN 1 END) AS reached_2,
          COUNT(CASE WHEN lvl >= 3 THEN 1 END) AS reached_3
        FROM m GROUP BY slot ORDER BY slot""")),

    // finderFunnel at user granularity: every (user, day) funnel level —
    // the raw level arrays funnelRep consumes, posexploded so the gate
    // hash-checks each slot.
    QueryDef(
      "funnel_finder_user_levels",
      (s, dir) => {
        val ff = graft.aggregates.FinderFunnelAgg
          .finderFunnel(WatchStartUs, DayUs, WatchDays, DayUs, 3) _
        steppedEvents(s, dir)
          .groupBy(col("user_id"))
          .agg(ff(unix_micros(col("ts")), col("step")).as("levels"))
          .select(col("user_id"), posexplode(col("levels")).as(Seq("slot", "lvl")))
          .filter(col("lvl") > 0)
          .orderBy(col("user_id"), col("slot"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'click' THEN us END) OVER w AS c_next,
                MIN(CASE WHEN event_type = 'click' THEN p_next END) OVER w AS cp_next
              FROM x
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        lv AS (SELECT user_id,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cp_next IS NOT NULL AND cp_next - us <= 86400000000 THEN 3
                      WHEN c_next IS NOT NULL AND c_next - us <= 86400000000 THEN 2
                      ELSE 1 END AS lvl
               FROM y WHERE event_type = 'signup'),
        m AS (SELECT user_id, slot, CAST(MAX(lvl) AS INTEGER) AS lvl FROM lv
              WHERE slot >= 0 AND slot < 30 GROUP BY 1, 2)
        SELECT user_id, slot, lvl FROM m ORDER BY user_id, slot"""))
  )
}
