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

  // -------- REAL codecs (graft.multimodal.MediaCodecs): RIFF/PCM WAV and
  // 24 bpp BMP are pure byte parsing — no codec library needed, so these
  // are NOT stubs. Each lowers to a StaticInvoke: one static call inside
  // whole-stage codegen, no UDF serialization.

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.types._

  private val codecs = MediaCodecs.getClass

  private def invoke(name: String, dt: DataType, args: Column*): Column =
    ColumnBridge.column(StaticInvoke(codecs, dt, name,
      args.map(ColumnBridge.expression): Seq[Expression]))

  def encodeWavSquare(sampleRate: Column, nFrames: Column, amplitude: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "encodeWavSquare",
      Seq(sampleRate, nFrames, amplitude).map(c =>
        ColumnBridge.expression(c.cast("int")))))

  def encodeBmpSolid(w: Column, h: Column, r: Column, g: Column, b: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "encodeBmpSolid",
      Seq(w, h, r, g, b).map(c => ColumnBridge.expression(c.cast("int")))))

  def wavSampleRate(media: Column): Column = invoke("wavSampleRate", IntegerType, media)
  def wavChannels(media: Column): Column = invoke("wavChannels", IntegerType, media)
  def wavBitsPerSample(media: Column): Column = invoke("wavBitsPerSample", IntegerType, media)
  def wavFrames(media: Column): Column = invoke("wavFrames", LongType, media)
  def wavDurationMs(media: Column): Column = invoke("wavDurationMs", DoubleType, media)
  def wavRms(media: Column): Column = invoke("wavRms", DoubleType, media)
  def wavPeak(media: Column): Column = invoke("wavPeak", DoubleType, media)

  def wavEnergyProfile(media: Column, nWindows: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs,
      ArrayType(DoubleType, containsNull = false), "wavEnergyProfile",
      Seq(ColumnBridge.expression(media),
        ColumnBridge.expression(nWindows.cast("int")))))

  def bmpResize(media: Column, w: Column, h: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "bmpResize",
      Seq(ColumnBridge.expression(media),
        ColumnBridge.expression(w.cast("int")),
        ColumnBridge.expression(h.cast("int")))))

  def bmpWidth(media: Column): Column = invoke("bmpWidth", IntegerType, media)
  def bmpHeight(media: Column): Column = invoke("bmpHeight", IntegerType, media)
  def bmpMeanRgb(media: Column): Column =
    invoke("bmpMeanRgb", ArrayType(DoubleType, containsNull = false), media)
  def bmpGray8x8(media: Column): Column =
    invoke("bmpGray8x8", ArrayType(DoubleType, containsNull = false), media)
  def bmpAHash(media: Column): Column = invoke("bmpAHash", LongType, media)

  // PNG/JPEG via the JDK's own ImageIO (MediaCodecs — real compressed-
  // format codecs, headless, no external library)
  def encodePngSolid(w: Column, h: Column, r: Column, g: Column, b: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "encodePngSolid",
      Seq(w, h, r, g, b).map(c => ColumnBridge.expression(c.cast("int")))))
  def encodePngGradient(w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "encodePngGradient",
      Seq(w, h, seed).map(c => ColumnBridge.expression(c.cast("int")))))
  def encodeJpegSolid(w: Column, h: Column, r: Column, g: Column, b: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "encodeJpegSolid",
      Seq(w, h, r, g, b).map(c => ColumnBridge.expression(c.cast("int")))))
  def mediaFormat(media: Column): Column = invoke("mediaFormat", StringType, media)
  def imageWidth(media: Column): Column = invoke("imageWidth", IntegerType, media)
  def imageHeight(media: Column): Column = invoke("imageHeight", IntegerType, media)
  def imageMeanRgb(media: Column): Column =
    invoke("imageMeanRgb", ArrayType(DoubleType, containsNull = false), media)
  def imageAHash(media: Column): Column = invoke("imageAHash", LongType, media)
  def imageResizePng(media: Column, w: Column, h: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs, BinaryType, "imageResizePng",
      Seq(ColumnBridge.expression(media),
        ColumnBridge.expression(w.cast("int")),
        ColumnBridge.expression(h.cast("int")))))
  def imageFeatures(media: Column, dim: Column): Column =
    ColumnBridge.column(StaticInvoke(codecs,
      ArrayType(DoubleType, containsNull = false), "imageFeatures",
      Seq(ColumnBridge.expression(media),
        ColumnBridge.expression(dim.cast("int")))))
}
