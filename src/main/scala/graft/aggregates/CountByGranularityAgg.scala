package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** countByGranularity (reference
  * AggregateFunctionCountByGranularity.h:63 addImpl /
  * AggregateFunctionCountByGranularity.cpp:410 optional granularity
  * parameter, default 8192): per distinct value, the number of
  * GRANULES — consecutive blocks of `granularity` rows in the input
  * stream — in which the value appears at least once. The per-stream
  * position table dedupes within a granule (a value seen twice in one
  * block counts once); merge adds per-value granule counts across
  * partial states.
  *
  * Like the reference, granule boundaries follow each aggregation
  * stream's row order, so for granularity > 1 the value depends on
  * physical row layout (the reference's blocks are whatever the
  * pipeline delivers; ours are each partition's partial-aggregate
  * stream). With granularity = 1 every row is its own granule and the
  * result is the exact per-value row count — fully deterministic; that
  * configuration is the oracle-gated query, the block semantics are
  * unit-traced on a single partition.
  *
  * The output array is value-sorted (the reference emits hash-table
  * order, which is unspecified anyway). Keys may be any integral,
  * float, or string type.
  */
case class CountByGranularityAgg(
    child: Expression,
    granularity: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountByGranularityAgg.State]
  with UnaryLike[Expression] {

  require(granularity > 0, s"countByGranularity: granularity must be > 0")

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("value", child.dataType),
      StructField("cnt", LongType))))

  override def createAggregationBuffer(): CountByGranularityAgg.State =
    new CountByGranularityAgg.State

  override def update(
      b: CountByGranularityAgg.State, input: InternalRow): CountByGranularityAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val pos = b.rowCount / granularity
      if (pos != b.lastPos) { b.seenThisGranule.clear(); b.lastPos = pos }
      if (b.seenThisGranule.add(v)) {
        b.counts.update(v, b.counts.getOrElse(v, 0L) + 1L)
      }
      b.rowCount += 1
    }
    b
  }

  override def merge(
      b: CountByGranularityAgg.State,
      other: CountByGranularityAgg.State): CountByGranularityAgg.State = {
    // Reference merge (CountByGranularity.h:152): add counts, reset the
    // position table — merged states never share granules.
    b.seenThisGranule.clear()
    b.lastPos = -1L
    other.counts.foreach { case (k, c) =>
      b.counts.update(k, b.counts.getOrElse(k, 0L) + c)
    }
    b
  }

  override def eval(b: CountByGranularityAgg.State): Any = {
    val ord: Ordering[Any] = child.dataType match {
      case StringType => Ordering.by((x: Any) => x.asInstanceOf[UTF8String].toString)
      case ByteType | ShortType | IntegerType | LongType => Ordering.by((x: Any) => x.asInstanceOf[Number].longValue())
      case _ => Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue())
    }
    val sorted = b.counts.toArray.sortBy(_._1)(ord)
    new GenericArrayData(sorted.map { case (v, c) => InternalRow(v, c) })
  }

  override def serialize(b: CountByGranularityAgg.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) =>
      child.dataType match {
        case StringType =>
          val bytes = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case ByteType | ShortType | IntegerType | LongType => out.writeLong(k.asInstanceOf[Number].longValue())
        case _ => out.writeDouble(k.asInstanceOf[Number].doubleValue())
      }
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountByGranularityAgg.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new CountByGranularityAgg.State
    (0 until n).foreach { _ =>
      val k: Any = child.dataType match {
        case StringType =>
          val len = in.readInt(); val buf = new Array[Byte](len)
          in.readFully(buf); UTF8String.fromBytes(buf)
        case LongType => java.lang.Long.valueOf(in.readLong())
        case IntegerType => java.lang.Integer.valueOf(in.readLong().toInt)
        case ShortType => java.lang.Short.valueOf(in.readLong().toShort)
        case ByteType => java.lang.Byte.valueOf(in.readLong().toByte)
        case FloatType => java.lang.Float.valueOf(in.readDouble().toFloat)
        case _ => java.lang.Double.valueOf(in.readDouble())
      }
      b.counts.update(k, in.readLong())
    }
    b.lastPos = -1L
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): CountByGranularityAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountByGranularityAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "count_by_granularity"
}

object CountByGranularityAgg {
  final class State extends Serializable {
    var rowCount: Long = 0L
    var lastPos: Long = -1L
    val seenThisGranule: mutable.HashSet[Any] = mutable.HashSet.empty
    val counts: mutable.HashMap[Any, Long] = mutable.HashMap.empty
  }
}
