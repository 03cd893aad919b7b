package graft

import graft.operators.SessionAnalysis
import org.apache.spark.sql.functions._

/** Gap-boundary semantics of sessionAnalysis (reference
  * AggregateFunctionSessionAnalysis.h:351 — `events[i].time >=
  * session_limit` breaks): an event at EXACTLY prev + gap starts a new
  * session, and the per-session tuple fields match the reference's
  * (duration, depth, end event, session time).
  */
class SessionAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split at >= gap; tuples carry duration/depth/end/start") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-01 00:00:10", "b"),
      (1L, "2024-01-01 00:00:40", "c"), // exactly 30s after previous → new session
      (1L, "2024-01-01 00:01:05", "d"), // 25s gap → same session (rolling limit)
      (2L, "2024-01-01 00:00:00", "x"))
      .toDF("u", "ts", "ev")
      .select(col("u"), col("ts").cast("timestamp").as("ts"), col("ev"))
    val rows = SessionAnalysis
      .sessions(df, col("u"), col("ts"), col("ev"), 30L * 1000000)
      .orderBy(col("user_id"), col("session_time"))
      .collect()
    assert(rows.length === 3)
    val s1 = rows(0)
    assert(s1.getAs[Long]("duration_us") === 10000000L)
    assert(s1.getAs[Long]("depth") === 2L)
    assert(s1.getAs[String]("end_event") === "b")
    assert(s1.getAs[java.sql.Timestamp]("session_time").toString
      === "2024-01-01 00:00:00.0")
    val s2 = rows(1)
    assert(s2.getAs[Long]("duration_us") === 25000000L)
    assert(s2.getAs[Long]("depth") === 2L)
    assert(s2.getAs[String]("end_event") === "d")
    val s3 = rows(2)
    assert(s3.getAs[Long]("depth") === 1L)
    assert(s3.getAs[String]("end_event") === "x")
    assert(s3.getAs[Long]("duration_us") === 0L)
  }

  test("equal-time ties break deterministically by event name") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "z"),
      (1L, "2024-01-01 00:00:05", "b"),
      (1L, "2024-01-01 00:00:05", "a"))
      .toDF("u", "ts", "ev")
      .select(col("u"), col("ts").cast("timestamp").as("ts"), col("ev"))
    val r = SessionAnalysis
      .sessions(df, col("u"), col("ts"), col("ev"), 30L * 1000000)
      .collect()(0)
    assert(r.getAs[String]("end_event") === "b") // max (ts, ev) pair
    assert(r.getAs[Long]("depth") === 3L)
  }
}
