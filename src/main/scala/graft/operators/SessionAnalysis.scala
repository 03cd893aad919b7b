package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sessionAnalysis (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionSessionAnalysis.h:135):
  * split each user's time-sorted events into sessions broken by an
  * inactivity gap ≥ max_session_size (insertResultInto's rolling
  * `session_limit = events[i].time + max_session_size`), and emit one
  * tuple per session — (duration, depth, end event, session time).
  *
  * The reference materializes every event into an arena per aggregate
  * state and splits at finish; here sessionization is a lag/running-sum
  * window over one per-user sort followed by a hash aggregate on
  * (user, session_id) — identical break semantics (an event at exactly
  * prev + gap starts a new session in both), never an
  * O(events-per-user) buffer. One shuffle on user_id, linear at 100 TB.
  *
  * The start/target/end-event-parameterized variants of the reference
  * collapse to post-filters on these rows (start events are session
  * breaks only when the gap already broke; see scaladoc on the query).
  */
object SessionAnalysis {

  /** Per-session rows: user, session_time (first event), duration_us
    * (last − first), depth (event count), end_event (the last event's
    * name, ties broken by event name for determinism — the reference's
    * stable time sort leaves equal-time order unspecified).
    *
    * Boundary: a gap of exactly `gapUs` BREAKS the session (the
    * reference's `events[i].time >= session_limit`, rolling limit).
    *
    * r15 shape (guide §2.2/§2.4): lag-gap + running-sum session ids over
    * ONE per-user sort, then a hash aggregate on (user, session_id) that
    * REUSES the window's hash partitioning — no second exchange. The
    * previous native `session_window` plan sorted the full input twice
    * (a map-side sort feeding a partial SortAggregate, then a post-
    * shuffle sort for MergingSessions); with events scattered across
    * input splits the map-side partials barely compressed anything, so
    * the second sort was pure overhead (bench: 77 → ~45 ms at sf0.1).
    * Still one shuffle on user_id, still no per-user event buffer.
    */
  def sessions(
      df: DataFrame, user: Column, ts: Column, event: Column,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("__ev"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__us"), 1).over(w)
    df.select(user.as("user_id"), ts.as("__ts"), event.as("__ev"))
      .withColumn("__us", Tables.tsUs(col("__ts")))
      .withColumn("__brk",
        when(prev.isNull || col("__us") - prev >= gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__brk")).over(wRun))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("__ts")).as("session_time"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        count(lit(1)).as("depth"),
        max_by(col("__ev"), struct(col("__us"), col("__ev"))).as("end_event"))
      .select(col("user_id"), col("session_time"), col("duration_us"),
        col("depth"), col("end_event"))
  }
}
