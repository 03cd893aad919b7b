package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** ByteDance behavioral session aggregates (reference
  * src/AggregateFunctions/AggregateFunctionSessionSplit.h — original
  * Scala implementation of the documented semantics):
  *
  * The event stream per group is (server_time, event, time, start_time,
  * end_time, url, refer[, extra args…]); only `predefine_pageview`
  * (point event at `time`) and `_be_active` (interval [start, end],
  * millisecond values ≥ 2^32 scaled to seconds) rows participate, rows
  * below the base_time watermark are dropped, and events sort stably by
  * `time`. A new session starts when the window bucket changes
  * (start/window), when the gap from the session end exceeds the split
  * time, and (sessionSplit/pageTime2 only) when a pageview arrives with
  * a non-empty refer ≠ "inner".
  *
  * Called from codegen via StaticInvoke over the collected group.
  */
object SessionSplitOps {

  private val U32Max = 4294967295L

  private final class Ev(
      val isPv: Boolean, val time: Long,
      val startTime: Long, val endTime: Long,
      val url: UTF8String, val refer: UTF8String,
      val args: Array[UTF8String]) {
    def st: Long = if (isPv) time else startTime
    def et: Long = if (isPv) time else endTime
  }

  private val Empty = UTF8String.fromString("")

  private def parse(events: ArrayData, nExtras: Int,
      baseTime: Long): Array[Ev] = {
    val n = events.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Ev](n)
    val width = 7 + nExtras
    var i = 0
    while (i < n) {
      if (!events.isNullAt(i)) {
        val r = events.getStruct(i, width)
        val evName = if (r.isNullAt(1)) "" else r.getUTF8String(1).toString
        val serverTime = if (r.isNullAt(0)) 0L else r.getLong(0)
        val kind = evName match {
          case "predefine_pageview" => 1
          case "_be_active" => 2
          case _ => 0
        }
        if (kind != 0 && serverTime >= baseTime) {
          val time = if (r.isNullAt(2)) 0L else r.getLong(2)
          var s = 0L
          var e = 0L
          var ok = true
          if (kind == 2) {
            s = if (r.isNullAt(3)) 0L else r.getLong(3)
            e = if (r.isNullAt(4)) 0L else r.getLong(4)
            if (s >= U32Max) s /= 1000
            if (e >= U32Max) e /= 1000
            ok = s <= e
          }
          if (ok) {
            def str(k: Int): UTF8String =
              if (r.isNullAt(k)) Empty else r.getUTF8String(k).clone()
            buf += new Ev(kind == 1, time, s, e, str(5), str(6),
              Array.tabulate(nExtras)(k => str(7 + k)))
          }
        }
      }
      i += 1
    }
    // stable by event time: ties keep arrival order (the reference skips
    // its sort entirely when the input already arrived time-ordered)
    buf.toArray.sortBy(_.time)
  }

  private def emptyArr: ArrayData = new GenericArrayData(Array.empty[Any])

  /** sessionSplit (r2 = false) / sessionSplitR2 (r2 = true). Output rows
    * (duration, depth, url, refer[, extras…]).
    */
  def sessionSplit(eventsRaw: ArrayData, split: Long, window: Long,
      base: Long, typ: Int, nExtras: Int, r2: Boolean): ArrayData = {
    val evs = parse(eventsRaw, nExtras, base)
    if (evs.isEmpty) return emptyArr
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var cur = evs(0)
    var ss = cur.st
    var se = cur.et
    var depth = 1
    var hasPv = cur.isPv
    var url: UTF8String = if (r2 || cur.isPv) cur.url else Empty
    var refer: UTF8String = if (r2 || cur.isPv) cur.refer else Empty
    var args: Array[UTF8String] = if (cur.isPv) cur.args else Array.empty
    def flushRow(): Unit = {
      val u = if (r2 && !hasPv) Empty else url
      val rf = if (r2 && !hasPv) Empty else refer
      val extras = if (nExtras == 0) Array.empty[Any]
        else if (args.isEmpty) Array.fill[Any](nExtras)(Empty)
        else args.asInstanceOf[Array[AnyRef]].toArray[Any]
      out += new GenericInternalRow(
        Array[Any]((se - ss).toInt, depth, u, rf) ++ extras)
    }
    var i = 1
    while (i < evs.length) {
      cur = evs(i)
      val cs = cur.st
      var newSession =
        ss / window != cs / window ||
        (cs >= se && cs - se > split)
      if (!r2 && cur.isPv && cur.refer.numBytes() > 0 &&
          cur.refer.toString != "inner")
        newSession = true
      if (!newSession) {
        if (r2) {
          if (cur.isPv) depth += 1
          se = math.max(se, cur.et)
          ss = math.min(ss, cs)
          if (cur.isPv) {
            if (!hasPv || typ == 1) {
              hasPv = true
              url = cur.url
              refer = cur.refer
            } else if (typ == 2) refer = cur.refer
          }
        } else {
          se = math.max(se, cur.et)
          ss = math.min(ss, cs)
          if (cur.isPv) {
            depth += 1
            if (!hasPv) {
              url = cur.url; refer = cur.refer; args = cur.args
              hasPv = true
            } else if (typ == 1) args = cur.args
          }
        }
      } else {
        flushRow()
        depth = 1
        ss = cur.st
        se = cur.et
        hasPv = cur.isPv
        if (r2) { url = cur.url; refer = cur.refer }
        else if (cur.isPv) { url = cur.url; refer = cur.refer; args = cur.args }
        else { url = Empty; refer = Empty; args = Array.empty }
      }
      i += 1
    }
    flushRow()
    new GenericArrayData(out.toArray[Any])
  }

  /** pageTime: per-url (visit count, dwell time) within split sessions,
    * counting only pageviews whose SESSION refer matches `referUrl`
    * ("all" = every refer). Output rows (url, cnt, dur) in first-seen
    * url order.
    */
  def pageTime(eventsRaw: ArrayData, split: Long, window: Long,
      base: Long, referUrl: UTF8String): ArrayData = {
    val evs = parse(eventsRaw, 0, base)
    if (evs.isEmpty) return emptyArr
    val all = referUrl.toString == "all"
    val res = scala.collection.mutable.LinkedHashMap[String, Array[Long]]()
    def bump(u: UTF8String): Array[Long] =
      res.getOrElseUpdate(u.toString, Array(0L, 0L))
    var cur = evs(0)
    var ss = cur.st
    var se = cur.et
    var pageStart = 0L
    var url: UTF8String = Empty
    var refer: UTF8String = Empty
    def validRefer: Boolean = all || refer.toString == referUrl.toString
    if (cur.isPv) {
      url = cur.url; refer = cur.refer; pageStart = ss
      if (validRefer) bump(url)(0) += 1
    }
    var i = 1
    while (i < evs.length) {
      cur = evs(i)
      val cs = cur.st
      val newSession =
        ss / window != cs / window ||
        (cs >= se && cs - se > split)
      if (!newSession) {
        if (cur.isPv && validRefer) {
          if (pageStart != 0 && cs > pageStart) bump(url)(1) += cs - pageStart
          url = cur.url
          bump(url)(0) += 1
          pageStart = cs
        }
        se = math.max(se, cur.et)
      } else {
        ss = cur.st
        se = cur.et
        if (cur.isPv) {
          pageStart = ss
          refer = cur.refer
          url = cur.url
          if (validRefer) bump(url)(0) += 1
        } else {
          pageStart = 0
          url = Empty; refer = Empty
        }
      }
      i += 1
    }
    new GenericArrayData(res.toArray.map { case (u, cd) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(u), cd(0).toInt, cd(1).toInt)): Any
    })
  }

  /** pageTime2: per-pageview dwell rows (url, dur, refer[, extras…]) —
    * dur is time to the NEXT pageview in the same session, 0 for a
    * session's last page. Splits additionally on external-refer
    * pageviews, like sessionSplit.
    */
  def pageTime2(eventsRaw: ArrayData, split: Long, window: Long,
      base: Long, nExtras: Int): ArrayData = {
    val evs = parse(eventsRaw, nExtras, base)
    if (evs.isEmpty) return emptyArr
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    def row(u: UTF8String, dur: Long, rf: UTF8String,
        args: Array[UTF8String]): InternalRow =
      new GenericInternalRow(Array[Any](u, dur.toInt, rf) ++
        (if (args.length == nExtras) args.asInstanceOf[Array[AnyRef]].toArray[Any]
         else Array.fill[Any](nExtras)(Empty)))
    var cur = evs(0)
    var ss = cur.st
    var se = cur.et
    var pageStart = 0L
    var url: UTF8String = Empty
    var refer: UTF8String = Empty
    var args: Array[UTF8String] = Array.empty
    if (cur.isPv) {
      url = cur.url; refer = cur.refer; args = cur.args; pageStart = ss
    }
    var i = 1
    while (i < evs.length) {
      cur = evs(i)
      val cs = cur.st
      var newSession =
        ss / window != cs / window ||
        (cs >= se && cs - se > split)
      if (cur.isPv && cur.refer.numBytes() > 0 && cur.refer.toString != "inner")
        newSession = true
      if (!newSession) {
        if (cur.isPv) {
          if (pageStart != 0 && cs >= pageStart)
            out += row(url, cs - pageStart, refer, args)
          url = cur.url; refer = cur.refer; args = cur.args
          pageStart = cs
        }
        se = math.max(se, cur.et)
      } else {
        if (pageStart != 0) out += row(url, 0, refer, args)
        ss = cur.st
        se = cur.et
        pageStart = 0
        if (cur.isPv) {
          url = cur.url; refer = cur.refer; args = cur.args
          pageStart = ss
        }
      }
      i += 1
    }
    if (pageStart != 0) out += row(url, 0, refer, args)
    new GenericArrayData(out.toArray[Any])
  }
}
