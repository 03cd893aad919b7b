package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** -ForEach aggregate combinator (reference
  * /root/reference/src/AggregateFunctions/Combinators/AggregateFunctionForEach.h:
  * `aggForEach(arr)` applies `agg` element-wise ACROSS rows — sumForEach
  * of [1,2] and [3] is [4,2]; index i aggregates over exactly the rows
  * whose array reaches index i, so ragged inputs are first-class).
  *
  * One shared buffer computes count/sum/min/max per index in a single
  * pass; each registered spelling projects its slice at finish. Sums are
  * quantized to long millionths inside the buffer (the repo's `Num.D6`
  * determinism convention: integer arithmetic is associative, so the
  * result is independent of partition merge order); min/max keep the raw
  * doubles, which are order-independent by nature. Merge is element-wise,
  * so partial aggregation combines map-side and the shuffle carries one
  * buffer per group, not one row per array element.
  */
final case class ForEachInput(arr: Seq[Double])

final case class ForEachBuf(
    var counts: Array[Long],
    var sums: Array[Long],
    var mins: Array[Double],
    var maxs: Array[Double])

abstract class ForEachBase[OUT] extends Aggregator[ForEachInput, ForEachBuf, OUT]
    with Serializable {

  def zero: ForEachBuf =
    ForEachBuf(Array.empty, Array.empty, Array.empty, Array.empty)

  private def grown(b: ForEachBuf, n: Int): ForEachBuf =
    if (b.counts.length >= n) b
    else ForEachBuf(
      b.counts.padTo(n, 0L), b.sums.padTo(n, 0L),
      b.mins.padTo(n, 0.0), b.maxs.padTo(n, 0.0))

  def reduce(b0: ForEachBuf, in: ForEachInput): ForEachBuf = {
    if (in.arr == null) return b0
    val b = grown(b0, in.arr.length)
    var i = 0
    while (i < in.arr.length) {
      val v = in.arr(i)
      if (b.counts(i) == 0L) { b.mins(i) = v; b.maxs(i) = v }
      else {
        if (v < b.mins(i)) b.mins(i) = v
        if (v > b.maxs(i)) b.maxs(i) = v
      }
      b.counts(i) += 1L
      b.sums(i) += math.rint(v * 1e6).toLong
      i += 1
    }
    b
  }

  def merge(a0: ForEachBuf, c: ForEachBuf): ForEachBuf = {
    val a = grown(a0, c.counts.length)
    var i = 0
    while (i < c.counts.length) {
      if (c.counts(i) > 0L) {
        if (a.counts(i) == 0L) { a.mins(i) = c.mins(i); a.maxs(i) = c.maxs(i) }
        else {
          if (c.mins(i) < a.mins(i)) a.mins(i) = c.mins(i)
          if (c.maxs(i) > a.maxs(i)) a.maxs(i) = c.maxs(i)
        }
        a.counts(i) += c.counts(i)
        a.sums(i) += c.sums(i)
      }
      i += 1
    }
    a
  }

  def bufferEncoder: Encoder[ForEachBuf] = Encoders.kryo
}

final class SumForEach extends ForEachBase[Seq[Double]] {
  def finish(b: ForEachBuf): Seq[Double] = b.sums.toSeq.map(_ / 1e6)
  def outputEncoder: Encoder[Seq[Double]] = ForEachAgg.seqDouble
}

final class AvgForEach extends ForEachBase[Seq[Double]] {
  // (micros/1e6)/count mirrors the oracle's decimal-sum→double→divide.
  def finish(b: ForEachBuf): Seq[Double] =
    b.sums.toSeq.zip(b.counts).map { case (s, n) => (s / 1e6) / n }
  def outputEncoder: Encoder[Seq[Double]] = ForEachAgg.seqDouble
}

final class MinForEach extends ForEachBase[Seq[Double]] {
  def finish(b: ForEachBuf): Seq[Double] = b.mins.toSeq
  def outputEncoder: Encoder[Seq[Double]] = ForEachAgg.seqDouble
}

final class MaxForEach extends ForEachBase[Seq[Double]] {
  def finish(b: ForEachBuf): Seq[Double] = b.maxs.toSeq
  def outputEncoder: Encoder[Seq[Double]] = ForEachAgg.seqDouble
}

final class CountForEach extends ForEachBase[Seq[Long]] {
  def finish(b: ForEachBuf): Seq[Long] = b.counts.toSeq
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoders.seqLong
}

object ForEachAgg {
  private[aggregates] val seqDouble: Encoder[Seq[Double]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[Double]]()
  }
  private val in = Encoders.product[ForEachInput]
  def sumForEach: UserDefinedFunction = udaf(new SumForEach, in)
  def avgForEach: UserDefinedFunction = udaf(new AvgForEach, in)
  def minForEach: UserDefinedFunction = udaf(new MinForEach, in)
  def maxForEach: UserDefinedFunction = udaf(new MaxForEach, in)
  def countForEach: UserDefinedFunction = udaf(new CountForEach, in)
}
