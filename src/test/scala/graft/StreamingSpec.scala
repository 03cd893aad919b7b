package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exactly-once semantics of the checkpointed incremental sink — the
  * MV-over-stream parity the reference gets from offsets-in-catalog.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("incremental sink consumes each source file exactly once") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    val sink = Files.createTempDirectory("graft_stream_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    Seq((1L, "click", 1.0), (2L, "purchase", 2.0), (3L, "purchase", 3.0))
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)

    def run(): Unit = StreamingPipeline.incrementalSink(spark, src, sink, ckpt)(
      _.filter(col("event_type") === "purchase").select($"event_id", $"value"))

    run()
    assert(spark.read.parquet(sink).count() === 2)

    // Re-run with no new data: checkpoint says everything is consumed.
    run()
    assert(spark.read.parquet(sink).count() === 2)

    // New source file: only its rows land, exactly once.
    Seq((4L, "purchase", 4.0), (5L, "view", 5.0))
      .toDF("event_id", "event_type", "value")
      .write.mode("append").parquet(src)
    run()
    val out = spark.read.parquet(sink)
    assert(out.count() === 3)
    assert(out.select("event_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L, 4L))
  }
}
