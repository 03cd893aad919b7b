package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a token array: each k-token shingle is
  * hashed as an xxhash64 chain over the token bytes (no shingle string is
  * ever built), and the per-seed minimum forms the signature. Computed
  * per document row inside whole-stage codegen — replaces an
  * explode(shingles) → 16×min groupBy pipeline (string-slicing lambdas +
  * a shuffle) with zero shuffles and a tight scalar loop.
  *
  * Returns null when the document has fewer than `shingleSize` tokens
  * (such documents have no shingles — matching the empty-array behavior
  * of the compositional form, whose explode dropped them).
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && shingleSize >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = n - shingleSize + 1
    if (m <= 0) return null
    // One byte-hash per token, then a seed-independent chain per shingle.
    val th = new Array[Long](n)
    var j = 0
    while (j < n) {
      th(j) = XXH64.hashUTF8String(toks.getUTF8String(j), 42L)
      j += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      var c = 42L
      var d = 0
      while (d < shingleSize) { c = XXH64.hashLong(th(i + d), c); d += 1 }
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashLong(c, s)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |int $m = $n - $shingleSize + 1;
         |if ($m <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $th = new long[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $th[$j] = $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  }
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $c = 42L;
         |    for (int $d = 0; $d < $shingleSize; $d++) $c = $xxh.hashLong($th[$i + $d], $c);
         |    for (int $s = 0; $s < $numHashes; $s++) {
         |      long $h = $xxh.hashLong($c, (long) $s);
         |      if ($h < $sig[$s]) $sig[$s] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
