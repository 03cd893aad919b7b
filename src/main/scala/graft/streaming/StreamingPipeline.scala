package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming over the events stream (reference streaming =
  * continuous Kafka ingestion with offsets committed transactionally to
  * the catalog, /root/reference/src/Storages/Kafka/CnchKafkaConsumeManager.h:36-78;
  * Spark equivalent: checkpointed sources + exactly-once sinks).
  *
  * For deterministic tests we drive the same parquet data through the
  * file-stream source with `Trigger.AvailableNow` — identical plan shape
  * to a Kafka source — and a complete-mode in-memory sink. Swapping
  * `format("parquet")` for `format("kafka")` + a checkpoint dir is the
  * production path.
  */
object StreamingPipeline {

  /** Tumbling-window counts per event type, executed as a streaming query
    * (batch parity with the `event_tumbling_counts` query).
    */
  def tumblingCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file-stream source wants a directory; point it at the sf dir and
    // glob-filter to the events table.
    var stream = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (batchSchema("ts").dataType == LongType)
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n_events"))
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
