package graft.aggregates

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Apache DataSketches aggregates (reference thetaSketch/kllSketch
  * families — /root/reference/src/AggregateFunctions/
  * AggregateFunctionThetaSketchEstimate.cpp, …KllSketch.cpp;
  * SketchBinary type, src/DataTypes/DataTypeSketchBinary.h:8) as
  * `TypedImperativeAggregate`s: the buffer is the sketch object itself and
  * serializes to the sketch's own compact binary form, so partial states
  * are small, binary-mergeable, and exchange-friendly — the pattern every
  * hot custom aggregate should use at 100 TB (vs udaf() whose buffer
  * round-trips through a kryo-encoded struct per group per row batch).
  */
abstract class SketchAgg[B] extends TypedImperativeAggregate[B] with UnaryLike[Expression] {
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): Expression
}

/** Theta-sketch approximate distinct count of a long column; deterministic
  * for a given input set (union is a set operation, hashing is seeded).
  */
case class ThetaDistinctAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Union] {

  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: Union, other: Union): Union = {
    b.union(other.getResult)
    b
  }

  override def eval(b: Union): Any = b.getResult.getEstimate

  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaDistinctAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaDistinctAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "theta_distinct"
}

/** KLL quantile estimate of a double column at rank `p` (inclusive
  * criterion, matching the reference's kllSketch getQuantile).
  */
case class KllQuantileAgg(
    child: Expression,
    p: Double,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[KllDoublesSketch] {

  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Number].doubleValue())
    b
  }

  override def merge(b: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    b.merge(other)
    b
  }

  override def eval(b: KllDoublesSketch): Any =
    if (b.isEmpty) null else b.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kll_quantile"
}

/** Like [[ThetaDistinctAgg]] but returns the SKETCH STATE (compact
  * bytes) instead of the estimate — the input to the uniqTheta set-op
  * scalars, mirroring the reference's AggregateFunction(uniqTheta, …)
  * state columns.
  */
case class ThetaStateAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Union] {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: Union, other: Union): Union = {
    b.union(other.getResult)
    b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray

  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaStateAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaStateAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "theta_state"
}

object SketchAggregates {
  import org.apache.spark.sql.functions.udf

  def thetaDistinct(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaDistinctAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  def kllQuantile(c: Column, p: Double, k: Int = 200): Column =
    ColumnBridge.column(
      KllQuantileAgg(ColumnBridge.expression(c), p, k).toAggregateExpression())

  def thetaState(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaStateAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  private def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** uniqTheta set-op scalars (reference
    * src/Functions/UniqTheta/FunctionsUniqTheta.h —
    * uniqThetaUnion/Intersect/Not over AggregateFunction(uniqTheta)
    * states). Inputs/outputs are compact sketch bytes; below the exact
    * threshold (2^lgK retained hashes) the sketches are exact sets, so
    * estimates equal exact counts — the oracle-comparable regime.
    */
  val uniqThetaUnion: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val u = SetOperation.builder().buildUnion()
      u.union(wrap(a)); u.union(wrap(b))
      u.getResult.toByteArray
    })
  val uniqThetaIntersect: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(wrap(a)); i.intersect(wrap(b))
      i.getResult.toByteArray
    })
  val uniqThetaNot: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val d = SetOperation.builder().buildANotB()
      d.setA(wrap(a)); d.notB(wrap(b))
      d.getResult(true).toByteArray
    })
  val thetaEstimate: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte]) => wrap(a).getEstimate)
}
