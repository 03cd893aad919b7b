package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd random-hyperplane LSH bucket id over an embedding
  * array — the bucketing step of the ANN index (SURVEY §2 similarity
  * extension; reference ANN-style scan pruning has no direct analogue,
  * buckets play the role of skip-index granules).
  *
  * Arithmetic is bit-identical to the composed higher-order form it
  * replaces (graft round-1 `hyperplaneLshBucket`): plane p's weight for
  * dimension d is `(pmod(xxhash64(p, d), 2000001) - 1000000) / 1e6`
  * (xxhash64 seeded 42 and chained exactly like Spark's `xxhash64(p, d)`
  * over two int columns), projections accumulate left-to-right in double,
  * sign bits fold MSB-first into a long. The HOF version interpreted
  * ~planes × dim lambda nodes per row with boxing; this compiles to two
  * nested scalar loops inside whole-stage codegen.
  */
case class HyperplaneLshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh_bucket"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val fl = isFloat
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val seed = XXH64.hashInt(p, 42L)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = XXH64.hashInt(d, seed)
        val m = ((h % 2000001L) + 2000001L) % 2000001L
        val w = (m - 1000000L).toDouble / 1000000.0
        val x = if (fl) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * w
        d += 1
      }
      bucket = bucket * 2 + (if (acc >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val get = if (isFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val seed = ctx.freshName("seed")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $seed = $xxh.hashInt($p, 42L);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $h = $xxh.hashInt($d, $seed);
         |    long $m = (($h % 2000001L) + 2000001L) % 2000001L;
         |    $acc += $get($d) * (($m - 1000000L) / 1000000.0);
         |  }
         |  $bucket = $bucket * 2 + ($acc >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}
