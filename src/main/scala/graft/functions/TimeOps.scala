package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** CH `Time` type family (reference src/DataTypes/DataTypeTime.h and
  * src/Functions registrations for toTimeType/MAKETIME/SEC_TO_TIME/
  * TIME_TO_SEC — the 10080_* corpus): time-of-day with a declared
  * fractional scale, printed `HH:mm:ss[.fff…]`.
  *
  * Engine representation: a one-field marker struct `{__time: String}`
  * holding the CANONICAL text padded to its scale — fixed-width digit
  * text compares exactly like the underlying value, so Spark's native
  * struct comparison/ordering/grouping all work untouched, and the
  * fraction WIDTH carries the declared scale through expressions.
  */
object TimeOps {

  /** Extract (hour, minute, second, fraction-text) from time /
    * datetime / date text. Returns None when unparseable.
    */
  private val timeRe =
    """^\s*(?:\d{4}-\d{2}-\d{2}(?:[ T]|\s*$))?(?:(\d{1,3}):(\d{1,2}):(\d{1,2})(?:\.(\d+))?)?\s*$""".r

  private def partsOf(t: String): Option[(Int, Int, Int, String)] =
    timeRe.findFirstMatchIn(t).map { m =>
      if (m.group(1) == null) (0, 0, 0, "")
      else (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
        Option(m.group(4)).getOrElse(""))
    }

  private def fmt(h: Int, mi: Int, se: Int, frac: String, scale: Int): String = {
    val base = f"$h%02d:$mi%02d:$se%02d"
    if (scale <= 0) base
    else base + "." + frac.padTo(scale, '0').take(scale)
  }

  /** chTime / toTimeType: parse flexible time text, truncate/pad the
    * fraction to `scale`. Unparseable → zero time (CH default-fills).
    */
  def parseTime(x: UTF8String, scale: Int): UTF8String = {
    require(scale >= 0 && scale <= 9,
      s"Time scale $scale out of [0, 9] (error 69 analog)")
    val t = x.toString
    val (h, mi, se, frac) = partsOf(t).getOrElse((0, 0, 0, ""))
    // Time carries hours beyond a day (the clock wraps at 100h, not
    // 24h — TIME(359999) prints 99:59:59); re-parses keep them
    UTF8String.fromString(fmt(h % 100, mi, se, frac, scale))
  }

  /** MySQL TIME(n) over a NUMBER: compact seconds wrapped at the type's
    * 100-hour clock (TIME(360001) = 00:00:01).
    */
  def fromNumber(v: Long, scale: Int): UTF8String = {
    val clock = 360000L
    val sod = ((v % clock) + clock) % clock
    val fracText = if (scale == 0) "" else "0" * scale
    UTF8String.fromString(fmt((sod / 3600).toInt, ((sod % 3600) / 60).toInt,
      (sod % 60).toInt, fracText, scale))
  }

  /** MAKETIME(h, m, s[, fraction[, scale]]): out-of-range components
    * yield the zero time; the fraction is an integer at the given scale
    * (right-aligned), clamped to the scale's maximum.
    */
  def makeTime(h: Long, m: Long, s: Long, frac: Long, scale: Int): UTF8String = {
    if (scale < 0 || scale > 9 || frac < -1)
      throw new IllegalArgumentException(
        s"MAKETIME: scale $scale / fraction $frac out of range (error 69)")
    if (frac < 0)
      throw new IllegalArgumentException(
        s"MAKETIME: negative fraction (error 69)")
    val valid = h >= 0 && h <= 23 && m >= 0 && m <= 59 && s >= 0 && s <= 59
    val cap = math.pow(10, scale).toLong - 1
    val f = math.min(frac, cap)
    val fracText =
      if (scale == 0) ""
      else s"%0${scale}d".format(if (valid) f else 0L)
    UTF8String.fromString(
      if (valid) fmt(h.toInt, m.toInt, s.toInt, fracText, scale)
      else fmt(0, 0, 0, fracText.replaceAll("\\d", "0"), scale))
  }

  /** SEC_TO_TIME: seconds-of-day (wrapping modulo 24h, negatives wrap
    * from midnight), fraction kept at `scale`.
    */
  def secToTime(seconds: Double, scale: Int): UTF8String = {
    val day = 86400L
    val whole = math.floor(seconds).toLong
    val fracD = seconds - whole
    val sod = ((whole % day) + day) % day
    val h = (sod / 3600).toInt
    val mi = ((sod % 3600) / 60).toInt
    val se = (sod % 60).toInt
    val fracText =
      if (scale == 0) ""
      else {
        val scaled = math.rint(fracD * math.pow(10, scale)).toLong
        s"%0${scale}d".format(scaled)
      }
    UTF8String.fromString(fmt(h, mi, se, fracText, scale))
  }

  /** TIME_TO_SEC: whole seconds of the time value. */
  def timeToSec(x: UTF8String): Long = {
    val (h, mi, se, _) = partsOf(x.toString).getOrElse((0, 0, 0, ""))
    h.toLong * 3600 + mi * 60 + se
  }

  /** Seconds-of-day INCLUDING the fraction (float casts of Time). */
  def timeSeconds(x: UTF8String): Double = {
    val (h, mi, se, frac) = partsOf(x.toString).getOrElse((0, 0, 0, ""))
    val f = if (frac.isEmpty) 0.0 else s"0.$frac".toDouble
    h.toLong * 3600 + mi * 60 + se + f
  }

  def hourOf(x: UTF8String): Int =
    partsOf(x.toString).map(_._1).getOrElse(0)
  def minuteOf(x: UTF8String): Int =
    partsOf(x.toString).map(_._2).getOrElse(0)
  def secondOf(x: UTF8String): Int =
    partsOf(x.toString).map(_._3).getOrElse(0)

  /** Time ± seconds, wrapping modulo 24h; the fraction (and its width =
    * the declared scale) is carried unchanged.
    */
  def addSeconds(x: UTF8String, delta: Long): UTF8String = {
    val t = x.toString
    val (h, mi, se, frac) = partsOf(t).getOrElse((0, 0, 0, ""))
    val day = 86400L
    val sod0 = h.toLong * 3600 + mi * 60 + se + delta
    val sod = ((sod0 % day) + day) % day
    UTF8String.fromString(fmt((sod / 3600).toInt, ((sod % 3600) / 60).toInt,
      (sod % 60).toInt, frac, frac.length))
  }

  /** ClickHouse `age`: boundary-crossing count adjusted down by one
    * incomplete unit, computed component-wise on WALL times (reference
    * src/Functions/dateDiff.cpp DiffType::Age — including its week
    * branch comparing x/y day-of-week rather than the swapped pair).
    * Inputs are wall-clock micros (the caller shifts into the LUT zone).
    */
  def chAge(unit: UTF8String, xm: Long, ym: Long,
      xe: Long, ye: Long): Long = {
    import java.time.LocalDateTime
    import java.time.ZoneOffset.UTC
    def ldt(m: Long): LocalDateTime = LocalDateTime
      .ofEpochSecond(Math.floorDiv(m, 1000000L),
        (Math.floorMod(m, 1000000L) * 1000L).toInt, UTC)
    val x = ldt(xm); val y = ldt(ym)
    val u = unit.toString.toLowerCase
    def relQuarter(t: LocalDateTime) =
      t.getYear.toLong * 4 + (t.getMonthValue - 1) / 3
    def relMonth(t: LocalDateTime) =
      t.getYear.toLong * 12 + (t.getMonthValue - 1)
    // reference DateLUTImpl::toRelativeWeekNum: (d + 8 - dow) / 7 with
    // C++ trunc-toward-zero division — differs from floorDiv for
    // pre-epoch operands (1969-12-28 is week 0, not -1)
    def relWeek(t: LocalDateTime) = {
      val d = t.toLocalDate.toEpochDay
      val dow = t.getDayOfWeek.getValue.toLong // Mon=1 … Sun=7
      (d + 8 - dow) / 7
    }
    // hour/minute/second relative numbers are EPOCH-based
    // (ToRelativeHourNumImpl et al. divide the raw time_t); the
    // calendar units use LUT wall components
    val xs = Math.floorDiv(xe, 1000000L)
    val ys = Math.floorDiv(ye, 1000000L)
    if (u == "second" || u == "ss" || u == "s") return ys - xs
    var res = u match {
      case "year" | "yy" | "yyyy" => y.getYear.toLong - x.getYear.toLong
      case "quarter" | "qq" => relQuarter(y) - relQuarter(x)
      case "month" | "mm" => relMonth(y) - relMonth(x)
      case "week" | "wk" | "ww" => relWeek(y) - relWeek(x)
      case "day" | "dd" | "d" =>
        y.toLocalDate.toEpochDay - x.toLocalDate.toEpochDay
      case "hour" | "hh" | "h" =>
        Math.floorDiv(ys, 3600L) - Math.floorDiv(xs, 3600L)
      case "minute" | "mi" | "n" =>
        Math.floorDiv(ys, 60L) - Math.floorDiv(xs, 60L)
      case other => throw new IllegalArgumentException(
        s"age: unknown unit '$other' (error 36 analog)")
    }
    val (a, b, adj) =
      if (xs <= ys) (x, y, -1L) else (y, x, 1L)
    def timeGt(p: LocalDateTime, q: LocalDateTime): Boolean =
      p.getHour > q.getHour ||
        (p.getHour == q.getHour && (p.getMinute > q.getMinute ||
          (p.getMinute == q.getMinute && p.getSecond > q.getSecond)))
    val bump = u match {
      case "year" | "yy" | "yyyy" =>
        a.getMonthValue > b.getMonthValue ||
          (a.getMonthValue == b.getMonthValue &&
            (a.getDayOfMonth > b.getDayOfMonth ||
              (a.getDayOfMonth == b.getDayOfMonth && timeGt(a, b))))
      case "quarter" | "qq" =>
        val am = (a.getMonthValue - 1) % 3
        val bm = (b.getMonthValue - 1) % 3
        am > bm || (am == bm && (a.getDayOfMonth > b.getDayOfMonth ||
          (a.getDayOfMonth == b.getDayOfMonth && timeGt(a, b))))
      case "month" | "mm" =>
        a.getDayOfMonth > b.getDayOfMonth ||
          (a.getDayOfMonth == b.getDayOfMonth && timeGt(a, b))
      case "week" | "wk" | "ww" =>
        val xd = x.getDayOfWeek.getValue; val yd = y.getDayOfWeek.getValue
        xd > yd || (xd == yd && a.getHour > b.getHour) ||
          (a.getHour == b.getHour && (a.getMinute > b.getMinute ||
            (a.getMinute == b.getMinute && a.getSecond > b.getSecond)))
      case "day" | "dd" | "d" => timeGt(a, b)
      case "hour" | "hh" | "h" =>
        a.getMinute > b.getMinute ||
          (a.getMinute == b.getMinute && a.getSecond > b.getSecond)
      case "minute" | "mi" | "n" => a.getSecond > b.getSecond
      case _ => false
    }
    if (bump) res + adj else res
  }

  /** UTC offset (seconds) of `zone` at epoch-seconds instant `secs`
    * (reference src/Functions/timezoneOffset.cpp — DateLUT offset). */
  def tzOffsetSeconds(secs: Long,
      zone: org.apache.spark.unsafe.types.UTF8String): Long =
    java.time.ZoneId.of(zone.toString).getRules
      .getOffset(java.time.Instant.ofEpochSecond(secs)).getTotalSeconds.toLong
}
