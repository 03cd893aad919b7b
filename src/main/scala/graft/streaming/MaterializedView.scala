package graft.streaming

import graft.operators.Mutations
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Scheduled materialized-view refresh (reference
  * /root/reference/src/Storages/MaterializedView/RefreshSchedule.cpp +
  * RefreshTaskScheduler: periodic full re-evaluation of the view query,
  * committed as a part swap). The push-on-insert half of the reference's
  * MV story is [[StreamingPipeline.incrementalSink]]; this is the batch
  * half — REFRESH every N, used when the view query isn't incrementally
  * maintainable (joins over mutable dims, window ranks, …).
  *
  * Refresh = recompute into a sibling temp dir, then the same rename-aside
  * commit as mutations, so readers only ever see a complete old or new
  * snapshot and a crash mid-refresh never loses the served copy.
  */
object MaterializedView {

  /** Whether a refresh is due, given the period and the last refresh
    * stamp (epoch ms) — the RefreshSchedule "next = last + period" rule.
    */
  def due(lastRefreshMs: Long, periodMs: Long, nowMs: Long): Boolean =
    nowMs - lastRefreshMs >= periodMs

  /** Recompute `view` and atomically swap it into `path`. Returns the
    * refreshed row count (what a scheduler would log as the task result),
    * observed during the write itself — no post-swap re-scan of the table.
    */
  def refresh(spark: SparkSession, path: String, view: => DataFrame): Long = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    val tmp = path + ".refreshing"
    val obs = Observation()
    view.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    Mutations.swapInto(spark, tmp, path)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Refresh only if due; returns Some(rowCount) when a refresh ran. */
  def refreshIfDue(
      spark: SparkSession,
      path: String,
      lastRefreshMs: Long,
      periodMs: Long,
      nowMs: Long)(view: => DataFrame): Option[Long] =
    if (due(lastRefreshMs, periodMs, nowMs)) Some(refresh(spark, path, view)) else None
}
