package graft.aggregates

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** topK / topKWeighted (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionTopK.h:33 over
  * src/Common/SpaceSaving.h): approximate most-frequent values, returned
  * as an array ordered by descending count with ties in first-arrival
  * order (the reference's SpaceSaving keeps ties in slot-insertion order,
  * which for unevicted values is stream order — 00840_top_k_weighted
  * pins `['hello','world']` for four equal-weight values).
  *
  * Scale design: the buffer is exact up to `capacity` distinct values per
  * group (far above the reference's k*3 slots, so corpus-scale results
  * are exact counts); past that a batched SpaceSaving eviction drops the
  * lowest-count half and remembers the evicted floor, so memory per group
  * is bounded at any stream length and heavy hitters keep exact counts.
  * Merge is entry-wise (+ floor max), so partial aggregation combines
  * map-side and the shuffle carries one bounded buffer per group.
  *
  * Arrival order across executors is made deterministic by stamping each
  * first occurrence with (partitionId << 24 | within-group arrival index)
  * — partition-major order, which on ordered sources (range, parquet row
  * order) equals single-node stream order.
  */
final class TopKEntry(var count: Long, var firstPos: Long)

final class TopKBuf(val capacity: Int) {
  val m = new java.util.LinkedHashMap[UnsafeRow, TopKEntry]()
  var nextIdx: Long = 0L
  var floor: Long = 0L

  def posNow(): Long = {
    val pid = TaskContext.get() match {
      case null => 0L
      case tc => tc.partitionId().toLong
    }
    val p = (pid << 24) | (nextIdx & 0xFFFFFFL)
    nextIdx += 1
    p
  }

  def add(key: UnsafeRow, w: Long, pos: Long): Unit = {
    val e = m.get(key)
    if (e != null) e.count += w
    else if (capacity <= 256 && m.size >= capacity) {
      // exact SpaceSaving for small capacities (the -Merge spellings
      // reserve k*3 cells like the reference): replace the single
      // minimum-count entry, inheriting its count (SpaceSaving.h
      // alpha + w) — the batched half-trim below would keep a
      // different tie set than the reference (01356 golden)
      var minKey: UnsafeRow = null
      var minE: TopKEntry = null
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (minE == null || en.getValue.count < minE.count ||
            (en.getValue.count == minE.count &&
              en.getValue.firstPos < minE.firstPos)) {
          minKey = en.getKey; minE = en.getValue
        }
      }
      m.remove(minKey)
      m.put(key, new TopKEntry(minE.count + w, pos))
    } else {
      m.put(key, new TopKEntry(floor + w, pos))
      if (m.size > capacity) trim()
    }
  }

  /** Batched SpaceSaving eviction: drop the lowest-count half, keep the
    * evicted maximum as the floor future inserts start from.
    */
  private def trim(): Unit = {
    val entries = new java.util.ArrayList(m.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue.count, a.getValue.count)
      if (c != 0) c else java.lang.Long.compare(a.getValue.firstPos, b.getValue.firstPos)
    }
    val keep = capacity / 2
    var i = entries.size - 1
    while (i >= keep) {
      val e = entries.get(i)
      if (e.getValue.count > floor) floor = e.getValue.count
      m.remove(e.getKey)
      i -= 1
    }
  }
}

/** `weightExpr = None` is plain topK (weight 1 per row). NULL values and
  * NULL weights are skipped, matching the reference's Nullable handling
  * (00531_aggregate_over_nullable).
  */
case class TopKAgg(
    child: Expression,
    weightExpr: Option[Expression],
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0 && k <= 0xFFFFFF,
    s"topK: k must be in [1, ${0xFFFFFF}], got $k")

  override def children: Seq[Expression] = child +: weightExpr.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = if (weightExpr.isDefined) "topk_weighted" else "topk"

  @transient private lazy val keyProj =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(capacity)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v == null) return b
    val w = weightExpr match {
      case None => 1L
      case Some(we) =>
        val wv = we.eval(input)
        if (wv == null) return b
        wv.asInstanceOf[Number].longValue()
    }
    val pos = b.posNow()
    b.add(keyProj(new GenericInternalRow(Array[Any](v))).copy(), w, pos)
    b
  }

  override def merge(b: TopKBuf, other: TopKBuf): TopKBuf = {
    if (other.floor > b.floor) b.floor = other.floor
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = b.m.get(e.getKey)
      if (mine != null) {
        mine.count += e.getValue.count
        if (e.getValue.firstPos < mine.firstPos) mine.firstPos = e.getValue.firstPos
      } else {
        b.m.put(e.getKey, e.getValue)
      }
    }
    // one deferred trim keeps merge O(n); entries past capacity evict here
    if (b.m.size > capacity) {
      val sorted = new java.util.ArrayList(b.m.entrySet())
      sorted.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue.count, x.getValue.count)
        if (c != 0) c else java.lang.Long.compare(x.getValue.firstPos, y.getValue.firstPos)
      }
      var i = sorted.size - 1
      while (i >= capacity) {
        val e = sorted.get(i)
        if (e.getValue.count > b.floor) b.floor = e.getValue.count
        b.m.remove(e.getKey)
        i -= 1
      }
    }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val entries = new java.util.ArrayList(b.m.entrySet())
    entries.sort { (a, c) =>
      val d = java.lang.Long.compare(c.getValue.count, a.getValue.count)
      if (d != 0) d else java.lang.Long.compare(a.getValue.firstPos, c.getValue.firstPos)
    }
    val n = math.min(k, entries.size)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = entries.get(i).getKey.get(0, child.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    var total = 4 + 8 + 8 + 4
    val it0 = b.m.entrySet().iterator()
    while (it0.hasNext) {
      total += 4 + it0.next().getKey.getSizeInBytes + 8 + 8
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(b.capacity)
    bb.putLong(b.nextIdx)
    bb.putLong(b.floor)
    bb.putInt(b.m.size)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.getKey.getSizeInBytes)
      e.getKey.writeTo(bb)
      bb.putLong(e.getValue.count)
      bb.putLong(e.getValue.firstPos)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val cap = bb.getInt
    val b = new TopKBuf(cap)
    b.nextIdx = bb.getLong
    b.floor = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      b.m.put(row, new TopKEntry(bb.getLong, bb.getLong))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head,
      weightExpr = if (newChildren.size > 1) Some(newChildren(1)) else None)
}
