package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import graft.Tables
import org.apache.spark.sql.functions._

/** sessionAnalysis (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionSessionAnalysis.h:135):
  * split each user's time-sorted events into sessions broken by an
  * inactivity gap ≥ max_session_size (insertResultInto's rolling
  * `session_limit = events[i].time + max_session_size`), and emit one
  * tuple per session — (duration, depth, end event, session time).
  *
  * The reference materializes every event into an arena per aggregate
  * state and splits at finish; the Spark-first shape is the native
  * `session_window` group-by — identical break semantics (an event at
  * exactly prev + gap starts a new session in both), but sessionization
  * happens in the hash aggregate with partial merging of overlapping
  * windows, never an O(events-per-user) buffer. One shuffle on
  * (user, session), linear at 100 TB.
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
    * Boundary: Spark merges TOUCHING session windows (an event at
    * exactly prev + gap would join the session), while the reference
    * breaks at `>= gap`; passing the window as gap − 1 µs makes the two
    * identical on the microsecond grid (diff < gap merges, diff ≥ gap
    * breaks).
    */
  def sessions(
      df: DataFrame, user: Column, ts: Column, event: Column,
      gapUs: Long): DataFrame =
    df.select(user.as("user_id"), ts.as("__ts"), event.as("__ev"))
      .groupBy(col("user_id"),
        session_window(col("__ts"), s"${gapUs - 1} microseconds"))
      .agg(
        (Tables.tsUs(max(col("__ts"))) - Tables.tsUs(min(col("__ts"))))
          .as("duration_us"),
        count(lit(1)).as("depth"),
        max_by(col("__ev"), struct(col("__ts"), col("__ev"))).as("end_event"),
        min(col("__ts")).as("session_time"))
      .select(col("user_id"), col("session_time"), col("duration_us"),
        col("depth"), col("end_event"))
}
