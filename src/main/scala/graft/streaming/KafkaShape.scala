package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The exact column contract of Spark's `format("kafka")` source, as an
  * adapter over any other (batch or streaming) DataFrame — the missing
  * half of the Kafka stand-in (reference src/Storages/Kafka/ — the
  * offline image carries no kafka client jar, documented since round 4).
  * Pipelines written against THIS schema run unmodified on the real
  * source: swapping `KafkaShape.adapt(fileStream, ...)` for
  * `spark.readStream.format("kafka")` changes no downstream code, in
  * either direction.
  */
object KafkaShape {

  /** The schema `format("kafka")` produces, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Wrap `df` into the Kafka contract: `keyCol`/`valueCol` are
    * serialized to bytes, `offsetCol` must be a per-partition-unique
    * long (a file-stream surrogate for the broker offset), `tsCol`
    * becomes the record timestamp (timestampType 0 = CreateTime, as the
    * broker default).
    */
  def adapt(
      df: DataFrame,
      topic: String,
      keyCol: String,
      valueCol: String,
      tsCol: String,
      offsetCol: String,
      partitions: Int = 1): DataFrame = {
    val out = df.select(
      col(keyCol).cast(StringType).cast(BinaryType).as("key"),
      col(valueCol).cast(StringType).cast(BinaryType).as("value"),
      lit(topic).as("topic"),
      pmod(hash(col(keyCol)), lit(partitions)).cast(IntegerType).as("partition"),
      col(offsetCol).cast(LongType).as("offset"),
      col(tsCol).cast(TimestampType).as("timestamp"),
      lit(0).as("timestampType"))
    require(
      out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"KafkaShape contract drifted: ${out.schema.treeString}")
    out
  }

  /** The standard first step after a Kafka read: bytes back to strings —
    * works identically on this adapter and on the real source.
    */
  def decode(kafka: DataFrame): DataFrame =
    kafka.select(
      col("key").cast(StringType).as("key"),
      col("value").cast(StringType).as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))
}
