package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math over `array<float>` embedding columns, composed from
  * higher-order built-ins (`zip_with` + `aggregate`) so the hot loop stays
  * in codegen. Floats are widened to double before multiplication so
  * results are reproducible and engine-independent.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Dot product in double precision, left-to-right accumulation —
    * composable higher-order-function form (works on any numeric arrays).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product via the native codegen'd expression (float arrays; same
    * arithmetic as [[dotHof]], compiled to a scalar loop).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature: `planes` sign bits, each from a
    * pseudo-random hyperplane derived deterministically from xxhash64 of
    * (plane, dimension) — no stored model, reproducible across runs.
    * Returns a bigint bucket id. Native codegen'd expression; see
    * [[HyperplaneLshBucket]] for the exact arithmetic contract.
    */
  def hyperplaneLshBucket(v: Column, planes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(HyperplaneLshBucket(ColumnBridge.expression(v), planes))
  }

  /** Multi-probe bucket set (Lv et al., "Multi-Probe LSH", VLDB'07): the
    * exact bucket plus every bucket within Hamming distance `radius` of
    * it. Near neighbors differ from the probe on few sign bits, so
    * probing the 1 + C(planes,1) + … + C(planes,radius) nearby buckets
    * recovers most of the recall a single-bucket lookup loses — while
    * still scanning a fixed, tiny fraction of the corpus. The probe side
    * explodes this array (tens of keys per probe); the corpus side stays
    * a plain equi-join on its one bucket, so the scale shape is
    * unchanged.
    */
  def multiProbeBuckets(bucket: Column, planes: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, "multiProbeBuckets supports radius 0..2")
    val flips1 = (0 until planes).map(i => bucket.bitwiseXOR(lit(1L << i)))
    val flips2 =
      if (radius < 2) Seq.empty
      else for { i <- 0 until planes; j <- (i + 1) until planes }
        yield bucket.bitwiseXOR(lit((1L << i) | (1L << j)))
    val keys = Seq(bucket) ++ (if (radius >= 1) flips1 else Seq.empty) ++ flips2
    array(keys: _*)
  }

  /** Reference higher-order-function form of [[hyperplaneLshBucket]] —
    * kept as the semantic spec the native expression is tested against.
    */
  def hyperplaneLshBucketHof(v: Column, planes: Int): Column = {
    val dv = asDouble(v)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1),
          (x, d) => x * ((pmod(xxhash64(p, d), lit(2000001L)) - 1000000L).cast(DoubleType) / 1000000.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, 1L).otherwise(0L)
    })
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, i) => acc * 2 + element_at(bits, i + lit(1)))
  }
}
