package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.{udaf, udf}
import org.roaringbitmap.longlong.Roaring64NavigableMap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** BitMap64 user-set analytics (reference BitMap64 type over roaring
  * bitmaps — /root/reference/src/DataTypes/DataTypeBitMap64.h:25,
  * groupBitmap aggregates — AggregateFunctionGroupBitmap.cpp, scalar
  * bitmap functions — src/Functions/FunctionsBitmap.cpp), rebuilt on
  * org.roaringbitmap (bundled with Spark).
  *
  * The aggregate's shuffle payload is the serialized bitmap (KBs for
  * millions of members), so set-intersection analytics over 100 TB of
  * events reduce to exchanging compressed bitmaps — the same reason the
  * reference ships this type.
  */
object BitmapAggregates {

  def serialize(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  /** groupBitmapState(x): build a roaring bitmap of the grouped int64s,
    * returned serialized (the reference's AggregateFunction-State column,
    * DataTypeAggregateFunction.h:14 — mergeable downstream).
    */
  class GroupBitmap extends Aggregator[Long, Roaring64NavigableMap, Array[Byte]] with Serializable {
    def zero: Roaring64NavigableMap = new Roaring64NavigableMap()
    def reduce(b: Roaring64NavigableMap, x: Long): Roaring64NavigableMap = { b.addLong(x); b }
    def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
      a.or(b); a
    }
    def finish(b: Roaring64NavigableMap): Array[Byte] = serialize(b)
    def bufferEncoder: Encoder[Roaring64NavigableMap] = Encoders.kryo
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  val groupBitmap: UserDefinedFunction = udaf(new GroupBitmap, Encoders.scalaLong)

  /** bitmapCardinality(state). */
  val bitmapCardinality: UserDefinedFunction =
    udf((bytes: Array[Byte]) => deserialize(bytes).getLongCardinality)

  /** bitmapAndCardinality(a, b) — |A ∩ B|. */
  val bitmapAndCardinality: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val x = deserialize(a); x.and(deserialize(b)); x.getLongCardinality
    })

  /** bitmapOrCardinality(a, b) — |A ∪ B|. */
  val bitmapOrCardinality: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val x = deserialize(a); x.or(deserialize(b)); x.getLongCardinality
    })

  /** bitmapAndnotCardinality(a, b) — |A \ B|. */
  val bitmapAndnotCardinality: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val x = deserialize(a); x.andNot(deserialize(b)); x.getLongCardinality
    })

  /** bitmapContains(state, x). */
  val bitmapContains: UserDefinedFunction =
    udf((bytes: Array[Byte], x: Long) => deserialize(bytes).contains(x))
}

/** topK (SpaceSaving — reference AggregateFunctionTopK.h:33): heavy
  * hitters with bounded memory. With `capacity` ≥ true NDV the counts are
  * exact (how the oracle checks it at test scale); at production scale the
  * capacity bounds memory and the result is the usual SpaceSaving
  * approximation.
  */
class TopK(k: Int, capacity: Int)
    extends Aggregator[Long, scala.collection.mutable.Map[Long, Long], Seq[Long]] with Serializable {
  import scala.collection.mutable

  def zero: mutable.Map[Long, Long] = mutable.Map.empty

  private def addCount(b: mutable.Map[Long, Long], x: Long, cnt: Long): Unit = {
    b.get(x) match {
      case Some(c) => b.update(x, c + cnt)
      case None =>
        if (b.size < capacity) b.update(x, cnt)
        else {
          // SpaceSaving: displace the current minimum, inheriting its count.
          val (minK, minC) = b.minBy(_._2)
          b.remove(minK)
          b.update(x, minC + cnt)
        }
    }
  }

  def reduce(b: mutable.Map[Long, Long], x: Long): mutable.Map[Long, Long] = {
    addCount(b, x, 1L); b
  }
  def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (x, c) => addCount(a, x, c) }
    a
  }
  def finish(b: mutable.Map[Long, Long]): Seq[Long] =
    b.toSeq.sortBy { case (x, c) => (-c, x) }.take(k).map(_._1)
  def bufferEncoder: Encoder[scala.collection.mutable.Map[Long, Long]] = Encoders.kryo
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoders.seqLong
}

object TopK {
  def apply(k: Int, capacity: Int = 1 << 16): UserDefinedFunction =
    udaf(new TopK(k, capacity), Encoders.scalaLong)
}
