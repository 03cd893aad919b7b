package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Behavioral path-split aggregates (original Scala implementations of
  * the documented reference semantics):
  *
  *  - pathSplit / R / D / RD (reference
  *    src/AggregateFunctions/AggregateFunctionPathSplit.h:133-284):
  *    sort events by (time, index, param) — descending for the R
  *    "terminating event" variants — then emit one session per
  *    index==1 anchor, extending while the gap between CONSECUTIVE
  *    events stays within max_session_size; each session renders at
  *    most max_session_depth (event, param) nodes, the D variants
  *    collapsing consecutive equal nodes.
  *
  *  - funnelPathSplit / R / D / RD (reference
  *    AggregateFunctionFunnelPathSplit.h:121-283): single best path —
  *    sessions anchor at "level-0 next-level" events (funnel step 1,
  *    or any event whose flagged extra property is non-null), walk
  *    every event inside the window/depth, levelling up when an event
  *    is the next funnel step (or carries the required extra prop —
  *    those emit a prop node with id -(level+1)); the FIRST session
  *    reaching the maximum level wins, early-exiting at level_flag.
  *
  *  - funnelPathSplitByTimes / R / D / RD (reference
  *    AggregateFunctionFunnelPathSplitByTimes.h:141-172): every
  *    anchor event opens its own bucket; each later event levels up
  *    the FIRST bucket (ascending id) waiting at the matching level —
  *    prop match tried before funnel-step match — and common or
  *    unmatched events append to every bucket still inside its
  *    window. All buckets emit, in id order.
  *
  * Called from codegen via StaticInvoke over the collected group, the
  * same shape as [[SessionSplitOps]].
  */
object PathSplitOps {

  private val Empty = UTF8String.fromString("")

  private final class Ev(val time: Long, val index: Int,
      val param: UTF8String, val extras: Array[UTF8String])

  /** events: array of struct(f1 time, f2 index, f3 param[, extras…]);
    * null extras entries model the reference's Nullable(String) props.
    */
  private def parse(events: ArrayData, nExtras: Int,
      reverse: Boolean): Array[Ev] = {
    val n = events.numElements()
    val buf = new ArrayBuffer[Ev](n)
    val width = 3 + nExtras
    var i = 0
    while (i < n) {
      if (!events.isNullAt(i)) {
        val r = events.getStruct(i, width)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val param = if (r.isNullAt(2)) Empty else r.getUTF8String(2).clone()
          val extras = Array.tabulate(nExtras) { k =>
            if (r.isNullAt(3 + k)) null else r.getUTF8String(3 + k).clone()
          }
          buf += new Ev(r.getLong(0), r.getInt(1), param, extras)
        }
      }
      i += 1
    }
    val arr = buf.toArray
    // total order (time, index, param); UTF8String compares byte-wise
    // like the reference's StringRef operator<
    val ord: Ordering[Ev] = (a: Ev, b: Ev) => {
      var c = java.lang.Long.compare(a.time, b.time)
      if (c == 0) c = Integer.compare(a.index, b.index)
      if (c == 0) c = a.param.compareTo(b.param)
      c
    }
    java.util.Arrays.sort(arr, (if (reverse) ord.reverse else ord))
    arr
  }

  private def node(id: Int, prop: UTF8String): InternalRow =
    InternalRow(id, prop)

  /** Render one session [start, end) capped at maxDepth nodes; D
    * variants skip an event equal to its RAW predecessor (the
    * reference compares events[i] to events[i-1], not to the last
    * emitted node).
    */
  private def renderSlice(evs: Array[Ev], start: Int, end: Int,
      maxDepth: Long, dedup: Boolean): GenericArrayData = {
    val out = new ArrayBuffer[Any]
    out += node(evs(start).index, evs(start).param)
    var k = start + 1
    while (k < end && out.length < maxDepth) {
      if (!(dedup && evs(k).index == evs(k - 1).index &&
            evs(k).param.equals(evs(k - 1).param)))
        out += node(evs(k).index, evs(k).param)
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  def pathSplit(events: ArrayData, maxSessionSize: Long, maxDepth: Long,
      reverse: Boolean, dedup: Boolean): ArrayData = {
    val evs = parse(events, 0, reverse)
    val n = evs.length
    val sessions = new ArrayBuffer[Any]
    var i = 0
    while (i < n) {
      while (i < n && evs(i).index != 1) i += 1
      if (i < n) {
        val start = i
        i += 1
        var go = true
        while (go && i < n) {
          // gap between consecutive events, oriented by sort direction
          val t1 = if (reverse) evs(i).time else evs(i - 1).time
          val t2 = if (reverse) evs(i - 1).time else evs(i).time
          if (t2 - t1 > maxSessionSize) go = false else i += 1
        }
        sessions += renderSlice(evs, start, i, maxDepth, dedup)
      }
    }
    new GenericArrayData(sessions.toArray)
  }

  // ---- shared prop-flag helpers (reference AggregateFunnelCommon.cpp:
  // getPropFlagFromLevel / nextLevelNeedPropNode / getExtraPropIndex) --

  private def needPropNode(flags: Array[Long], level: Int): Boolean = {
    val bucket = level >>> 6
    bucket < flags.length && ((flags(bucket) >>> (level & 63)) & 1L) == 1L
  }

  private def extraPropIndex(flags: Array[Long], level: Int): Int = {
    val bucket = level >>> 6
    var cnt = 0
    var b = 0
    while (b < bucket) { cnt += java.lang.Long.bitCount(flags(b)); b += 1 }
    cnt + java.lang.Long.bitCount(flags(bucket) & ((1L << (level & 63)) - 1))
  }

  private def renderSingle(path: ArrayBuffer[(Int, UTF8String)],
      maxDepth: Long, dedup: Boolean): ArrayData = {
    if (path.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val out = new ArrayBuffer[Any]
      out += node(path(0)._1, path(0)._2)
      var k = 1
      while (k < path.length && out.length < maxDepth) {
        if (!(dedup && path(k)._1 == path(k - 1)._1 &&
              path(k)._2.equals(path(k - 1)._2)))
          out += node(path(k)._1, path(k)._2)
        k += 1
      }
      new GenericArrayData(Array[Any](new GenericArrayData(out.toArray)))
    }
  }

  def funnelPathSplit(events: ArrayData, window: Long, maxDepth: Long,
      levelFlag: Long, propFlagsIn: ArrayData, nExtras: Int,
      reverse: Boolean, dedup: Boolean): ArrayData = {
    val propFlags = propFlagsIn.toLongArray()
    val evs = parse(events, nExtras, reverse)
    val n = evs.length

    def isNextLevel(level: Int, e: Ev): Boolean =
      if (needPropNode(propFlags, level))
        e.extras(extraPropIndex(propFlags, level)) != null
      else e.index != 0 && e.index <= levelFlag && e.index == level + 1

    var maxPath = new ArrayBuffer[(Int, UTF8String)]
    var maxLevel = 0
    var i = 0
    var nextFirst = 0
    var done = false
    while (!done && i < n) {
      if (nextFirst != 0) i = nextFirst
      else while (i < n && !isNextLevel(0, evs(i))) i += 1
      if (i >= n) done = true
      else {
        val cur = new ArrayBuffer[(Int, UTF8String)]
        var level = 0
        def addLevelNode(e: Ev, curLevel: Int): Unit = {
          if (needPropNode(propFlags, curLevel))
            cur += ((-(curLevel + 1),
              e.extras(extraPropIndex(propFlags, curLevel))))
          else cur += ((e.index, e.param))
          level += 1
        }
        addLevelNode(evs(i), 0)
        val startTime = evs(i).time
        nextFirst = 0
        var go = true
        while (go && { i += 1; i < n }) {
          val e = evs(i)
          val duration = if (reverse) startTime - e.time else e.time - startTime
          // on break, i stays at the breaking event — it is re-examined
          // as the next session's anchor candidate
          if (duration > window || cur.length >= maxDepth) go = false
          else {
            if (nextFirst == 0 && isNextLevel(0, e)) nextFirst = i
            if (e.index == 0 || !isNextLevel(level, e)) cur += ((e.index, e.param))
            else addLevelNode(e, level)
          }
        }
        if (level > maxLevel) { maxLevel = level; maxPath = cur }
        if (maxLevel == levelFlag) done = true
      }
    }
    renderSingle(maxPath, maxDepth, dedup)
  }

  def funnelPathSplitByTimes(events: ArrayData, window: Long,
      maxDepth: Long, levelFlag: Long, propFlagsIn: ArrayData,
      nExtras: Int, reverse: Boolean, dedup: Boolean): ArrayData = {
    val propFlags = propFlagsIn.toLongArray()
    val evs = parse(events, nExtras, reverse)
    val n = evs.length

    // extraPropLevel(k): the level served by the k-th extra property =
    // 1 + the bit position of the k-th set bit across the flag words
    val extraPropLevel = new Array[Int](nExtras)
    var lvl = 1
    var epi = 0
    propFlags.foreach { flag0 =>
      var flag = flag0
      while (flag != 0) {
        if ((flag & 1L) == 1L && epi < nExtras) {
          extraPropLevel(epi) = lvl; epi += 1
        }
        lvl += 1
        flag >>>= 1
      }
    }

    final class Bucket(val beginTime: Long) {
      val path = new ArrayBuffer[(Int, UTF8String)]
      var level = 0
    }
    val buckets = new ArrayBuffer[Bucket]
    val Unreached = Int.MaxValue
    // level → bucket ids waiting at that level, ascending (the
    // reference's std::set iteration order)
    val levelMap =
      new scala.collection.mutable.HashMap[Int, java.util.TreeSet[Integer]]

    def mapAdd(id: Int, level: Int): Unit =
      levelMap.getOrElseUpdate(level, new java.util.TreeSet[Integer]).add(id)
    def mapMove(id: Int, from: Int, toUnreached: Boolean): Unit = {
      levelMap.get(from).foreach(_.remove(Integer.valueOf(id)))
      mapAdd(id, if (toUnreached) Unreached else from + 1)
    }

    def isNextLevel(level: Int, e: Ev): Boolean =
      if (needPropNode(propFlags, level))
        e.extras(extraPropIndex(propFlags, level)) != null
      else e.index == level + 1 // byTimes skips the isFunnelEvent guard here

    def checkWindow(b: Bucket, e: Ev): Boolean =
      if (b.path.isEmpty) true
      else if (reverse) b.beginTime - e.time <= window
      else e.time - b.beginTime <= window

    def addLevelNode(b: Bucket, e: Ev, curLevel: Int): Unit = {
      if (needPropNode(propFlags, curLevel))
        b.path += ((-(curLevel + 1),
          e.extras(extraPropIndex(propFlags, curLevel))))
      else b.path += ((e.index, e.param))
      b.level += 1
    }

    def tryUpdateBucket(id: Int, e: Ev, level: Int): Boolean = {
      val b = buckets(id)
      if (!checkWindow(b, e)) { mapMove(id, level, toUnreached = true); false }
      else {
        addLevelNode(b, e, level)
        mapMove(id, level, toUnreached = b.path.length >= maxDepth)
        true
      }
    }

    def waiting(level: Int): Array[Int] = levelMap.get(level) match {
      case Some(s) if !s.isEmpty =>
        val out = new Array[Int](s.size)
        val it = s.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        out
      case _ => Array.emptyIntArray
    }

    def tryAsPropNode(e: Ev): Boolean = {
      var pi = 0
      while (pi < nExtras) {
        if (e.extras(pi) != null) {
          val nextLevel = extraPropLevel(pi)
          if (nextLevel >= 1) {
            val ids = waiting(nextLevel - 1)
            var k = 0
            while (k < ids.length) {
              if (tryUpdateBucket(ids(k), e, nextLevel - 1)) return true
              k += 1
            }
          }
        }
        pi += 1
      }
      false
    }

    def tryAsLevelNode(e: Ev): Boolean = {
      if (e.index == 0 || e.index > levelFlag) false
      else {
        val ids = waiting(e.index - 1)
        var k = 0
        while (k < ids.length) {
          if (tryUpdateBucket(ids(k), e, e.index - 1)) return true
          k += 1
        }
        false
      }
    }

    def addAsCommon(e: Ev): Unit = {
      var id = 0
      while (id < buckets.length) {
        val b = buckets(id)
        var reachable = checkWindow(b, e)
        if (reachable) b.path += ((e.index, e.param))
        reachable &&= b.path.length < maxDepth
        if (!reachable) mapMove(id, b.level, toUnreached = true)
        id += 1
      }
    }

    var i = 0
    while (i < n) {
      val e = evs(i)
      if (isNextLevel(0, e)) {
        val b = new Bucket(e.time)
        buckets += b
        addLevelNode(b, e, 0)
        mapAdd(buckets.length - 1, 1)
      } else if (e.index == 0) addAsCommon(e)
      else if (!tryAsPropNode(e) && !tryAsLevelNode(e)) addAsCommon(e)
      i += 1
    }

    val out = new ArrayBuffer[Any]
    buckets.foreach { b =>
      if (b.path.nonEmpty) {
        val sess = new ArrayBuffer[Any]
        sess += node(b.path(0)._1, b.path(0)._2)
        var k = 1
        while (k < b.path.length && sess.length < maxDepth) {
          if (!(dedup && b.path(k)._1 == b.path(k - 1)._1 &&
                b.path(k)._2.equals(b.path(k - 1)._2)))
            sess += node(b.path(k)._1, b.path(k)._2)
          k += 1
        }
        out += new GenericArrayData(sess.toArray)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
