package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus feature-extraction
  * operators whose Spark-side shape (schema, partitioning, batch-at-a-time
  * evaluation) is real while the codec itself is a STUB — this container
  * has no image/audio libraries, so decode is a deterministic fake. A
  * production deployment replaces `fakeDecodeFeatures` with a vectorized
  * batch UDF calling a real codec; every plan around it is unchanged.
  */
object Multimodal {

  /** Attach a media payload + metadata struct to any table (test fixture:
    * the payload is the document text as bytes).
    */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        length(col(textCol)).as("n_bytes"),
        lit("fake/raw").as("format"),
        (abs(xxhash64(col(textCol))) % 1000 + 1).cast("int").as("width"),
        (abs(xxhash64(lit(1), col(textCol))) % 1000 + 1).cast("int").as("height"))
        .as("meta"))

  /** STUB decode → fixed-dim feature vector. Deterministic pseudo-features
    * from seeded hashes of the payload; shape and types match a real
    * embedding extractor (`array<double>` of `dim`).
    */
  def fakeDecodeFeatures(media: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(i, media), lit(2000001L)) - 1000000L).cast(DoubleType) / 1000000.0)

  /** STUB frame sampling: n byte-range "frames" of the payload — stands in
    * for video frame extraction; slicing/batching is the real concern.
    */
  def sampleFrames(media: Column, n: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => call_function("substring", media, lit(1) + i * frameBytes, lit(frameBytes)))
}
