package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** quantileInterpolatedWeighted (reference
  * /root/reference/src/AggregateFunctions/QuantileInterpolatedWeighted.h):
  * the weighted-percentile method — weights are summed per DISTINCT value
  * (the state is a value→weight map), sorted values get positions
  * x_i = (cum_i − 0.5·w_i) / Σw, and the level is linearly interpolated
  * between the bracketing positions. This differs from repeat-expansion
  * percentile even for integral weights: values {1,2} with weights {3,1}
  * at level 0.5 give 1.25 here but 1.0 by repetition.
  *
  * Buffer = the distinct-value map, so partial-state size is the distinct
  * cardinality, not the row count — map-side partials stay small and
  * merge is a map union (order-independent, exchange-friendly).
  */
case class InterpolatedWeightedQuantileAgg(
    child: Expression,
    weight: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Double]]
  with BinaryLike[Expression] {

  require(level >= 0.0 && level <= 1.0,
    s"quantileInterpolatedWeighted: level must be in [0, 1], got $level")

  override def left: Expression = child
  override def right: Expression = weight
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.HashMap[Double, Double] =
    mutable.HashMap.empty

  override def update(
      b: mutable.HashMap[Double, Double], input: InternalRow): mutable.HashMap[Double, Double] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val key = v.asInstanceOf[Number].doubleValue()
      b.update(key, b.getOrElse(key, 0.0) + w.asInstanceOf[Number].doubleValue())
    }
    b
  }

  override def merge(
      b: mutable.HashMap[Double, Double],
      other: mutable.HashMap[Double, Double]): mutable.HashMap[Double, Double] = {
    other.foreach { case (k, w) => b.update(k, b.getOrElse(k, 0.0) + w) }
    b
  }

  /** Mirrors getImpl: positions (cum − 0.5·w)/Σw over value-sorted
    * distinct entries, bracket search capped at size−2, end clamps
    * (level below x_0 / above x_last pin to the boundary value), then
    * yl + (dy/dx)(level − xl) with dx=0 → 1 like the reference.
    */
  override def eval(b: mutable.HashMap[Double, Double]): Any = {
    if (b.isEmpty) return null
    val pairs = b.toArray.sortBy(_._1)
    val size = pairs.length
    val sumW = pairs.map(_._2).sum
    val x = new Array[Double](size)
    var cum = 0.0
    var i = 0
    while (i < size) {
      cum += pairs(i)._2
      x(i) = if (sumW != 0) (cum - 0.5 * pairs(i)._2) / sumW else 0.0
      i += 1
    }
    var idx = 0
    if (size >= 2) {
      if (level >= x(size - 2)) idx = size - 2
      else {
        while (idx < size - 2 && level > x(idx + 1)) idx += 1
      }
    }
    val u = if (idx + 1 < size) idx + 1 else idx
    val (xl, xr) = (x(idx), x(u))
    var (yl, yr) = (pairs(idx)._1, pairs(u)._1)
    if (level < xl) yr = yl
    if (level > xr) yl = yr
    val dx = if (xr - xl == 0) 1.0 else xr - xl
    yl + (yr - yl) / dx * (level - xl)
  }

  override def serialize(b: mutable.HashMap[Double, Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, w) => out.writeDouble(k); out.writeDouble(w) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[Double, Double]
    (0 until n).foreach { _ => val k = in.readDouble(); b.update(k, in.readDouble()) }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): InterpolatedWeightedQuantileAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): InterpolatedWeightedQuantileAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, weight = newRight)
  override def prettyName: String = "quantile_interpolated_weighted"
}

/** quantileBFloat16 / quantileBFloat16Weighted (reference
  * QuantileBFloat16Histogram.h): each value truncated to bfloat16 (the
  * top 16 bits of its float32 form), weights histogrammed per truncated
  * value, and the result is the first value whose cumulative weight
  * reaches ⌈level · Σw⌉ — a discrete threshold, not interpolation. The
  * buffer is at most 2^16 entries regardless of input size, so partial
  * states are tiny and merges are histogram adds.
  */
case class BFloat16WeightedQuantileAgg(
    child: Expression,
    weight: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Double]]
  with BinaryLike[Expression] {

  require(level >= 0.0 && level <= 1.0,
    s"quantileBFloat16: level must be in [0, 1], got $level")

  override def left: Expression = child
  override def right: Expression = weight
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private def toBf16(v: Double): Int =
    java.lang.Float.floatToRawIntBits(v.toFloat) >>> 16

  private def toF32(k: Int): Float = java.lang.Float.intBitsToFloat(k << 16)

  override def createAggregationBuffer(): mutable.HashMap[Int, Double] =
    mutable.HashMap.empty

  override def update(
      b: mutable.HashMap[Int, Double], input: InternalRow): mutable.HashMap[Int, Double] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val key = toBf16(v.asInstanceOf[Number].doubleValue())
      b.update(key, b.getOrElse(key, 0.0) + w.asInstanceOf[Number].doubleValue())
    }
    b
  }

  override def merge(
      b: mutable.HashMap[Int, Double],
      other: mutable.HashMap[Int, Double]): mutable.HashMap[Int, Double] = {
    other.foreach { case (k, w) => b.update(k, b.getOrElse(k, 0.0) + w) }
    b
  }

  override def eval(b: mutable.HashMap[Int, Double]): Any = {
    if (b.isEmpty) return null
    val pairs = b.toArray.map { case (k, w) => (toF32(k), w) }.sortBy(_._1)
    val sumW = pairs.map(_._2).sum
    val threshold = math.ceil(sumW * level)
    var acc = 0.0
    var i = 0
    while (i < pairs.length) {
      acc += pairs(i)._2
      if (acc >= threshold) return pairs(i)._1.toDouble
      i += 1
    }
    pairs.last._1.toDouble
  }

  override def serialize(b: mutable.HashMap[Int, Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, w) => out.writeInt(k); out.writeDouble(w) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[Int, Double]
    (0 until n).foreach { _ => val k = in.readInt(); b.update(k, in.readDouble()) }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): BFloat16WeightedQuantileAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BFloat16WeightedQuantileAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, weight = newRight)
  override def prettyName: String = "quantile_bfloat16_weighted"
}

object WeightedQuantileAgg {
  def quantileInterpolatedWeighted(x: Column, w: Column, level: Double): Column =
    ColumnBridge.column(
      InterpolatedWeightedQuantileAgg(
        ColumnBridge.expression(x), ColumnBridge.expression(w), level)
        .toAggregateExpression())

  def quantileBFloat16Weighted(x: Column, w: Column, level: Double): Column =
    ColumnBridge.column(
      BFloat16WeightedQuantileAgg(
        ColumnBridge.expression(x), ColumnBridge.expression(w), level)
        .toAggregateExpression())
}
