package graft.sql

import java.sql.{Date, Timestamp}
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** ClickHouse TabSeparated output formatting for Spark rows — the
  * representation the reference's `.reference` golden files are written
  * in (FormatFactory TabSeparated;
  * /root/reference/src/Formats/registerFormats.cpp, escaping rules in
  * src/IO/WriteHelpers.h writeEscapedString): columns tab-separated,
  * rows newline-terminated, strings raw at top level but quoted inside
  * composites, NULL as `\N`, floats in shortest round-trip form.
  */
object ChFormat {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Wall-clock zone for DateTime text — the reference prints server
    * time, and its test corpus is generated under Europe/Moscow
    * (clickhouse-test pins TZ); the corpus runner passes the session's
    * timezone here. A parameter, not a global: a parallel run mixing
    * corpus and library suites must not race on shared state.
    */
  def formatRows(rows: Seq[org.apache.spark.sql.Row],
      zone: java.time.ZoneId = ZoneOffset.UTC,
      schema: org.apache.spark.sql.types.StructType = null): String = {
    val hints: Array[(Option[Int], Option[java.time.ZoneId])] =
      Option(schema)
        .orElse(rows.headOption.flatMap(r => Option(r.schema))) match {
        case Some(sch) => sch.fields.map(colHint)
        case None => Array.empty
      }
    rows.map(r => (0 until r.length).map { i =>
      val (sc, tz) = if (i < hints.length) hints(i) else (None, None)
      top(r.get(i), tz.getOrElse(zone), sc)
    }.mkString("\t")).mkString("\n")
  }

  /** DateTime64 render hints for a column: the declared scale and an
    * explicit column timezone. Table columns carry them as metadata
    * (graft.ch.dt64 / graft.ch.tz, attached at CREATE); computed
    * toDateTime64(…)/CAST(…, 'DateTime64(s)') select items surface them
    * in Spark's auto-generated column NAME (the golden TabSeparated
    * output never shows names, so the name is a free channel).
    */
  private def colHint(f: org.apache.spark.sql.types.StructField)
      : (Option[Int], Option[java.time.ZoneId]) = {
    val m = f.metadata
    val metaScale =
      if (m.contains("graft.ch.dt64")) Some(m.getLong("graft.ch.dt64").toInt)
      else None
    val metaTz =
      if (m.contains("graft.ch.tz")) Some(m.getString("graft.ch.tz")) else None
    // Spark's auto-alias strips string quotes: the name reads
    // `toDateTime64(2205-12-12 12:12:12, 0, UTC)` — a timezone is a
    // letter-led token, the scale the trailing comma-number before it
    val n = f.name
    val callRe =
      ("""(?i)^\s*toDateTime64(?:OrNull|OrZero)?\(.*,\s*(\d+)\s*""" +
        """(?:,\s*'?([A-Za-z][\w/+\-]*)'?\s*)?\)\s*$""").r
    val castRe = """(?i)(?<![\w])DateTime64\s*\(\s*(\d+)\s*(?:,\s*'?([A-Za-z][\w/+\-]*)'?)?""".r
    // inner form: toDateTime64(…) nested under addHours etc. — the
    // result type (and so scale + display tz) carries through
    val innerRe =
      """(?i)toDateTime64(?:OrNull|OrZero)?\([^()]*?,\s*(\d+)\s*(?:,\s*'?([A-Za-z][\w/+\-]*)'?\s*)?\)""".r
    // toDateTime(x, 'tz'): display-zone only, no fractional digits
    val dtTzRe =
      """(?i)^\s*toDateTime(?:OrNull|OrZero)?\([^()]*,\s*'?([A-Za-z][\w/+\-]*)'?\s*\)\s*$""".r
    val hit = callRe.findFirstMatchIn(n).orElse(castRe.findFirstMatchIn(n))
      .orElse(innerRe.findFirstMatchIn(n))
    val nameScale = metaScale.orElse(hit.map(_.group(1).toInt))
    val nameTz = metaTz.orElse(hit.flatMap(x => Option(x.group(2))))
      .orElse(dtTzRe.findFirstMatchIn(n).map(_.group(1)))
    (nameScale,
      nameTz.flatMap(z => scala.util.Try(java.time.ZoneId.of(z)).toOption))
  }

  /** Top-level column value: strings raw (escaped), NULL = \N. */
  def top(v: Any, zone: java.time.ZoneId,
      dt64Scale: Option[Int] = None): String = v match {
    case null => "\\N"
    case s: String => escape(s)
    case b: Array[Byte] => escape(new String(b, "UTF-8")) // CH String from unhex etc.
    case t: Timestamp if dt64Scale.isDefined =>
      tsTextScaled(t.toInstant.atZone(zone).toLocalDateTime, dt64Scale.get)
    case t: java.time.Instant if dt64Scale.isDefined =>
      tsTextScaled(t.atZone(zone).toLocalDateTime, dt64Scale.get)
    case other => value(other, quoted = false, zone)
  }

  /** DateTime64(s) text: EXACTLY s fractional digits (zero-padded,
    * truncated past micros — the engine keeps micros). Scale 0 prints
    * whole seconds (reference writeDateTimeText with scale).
    */
  private def tsTextScaled(t: java.time.LocalDateTime, s: Int): String = {
    val base = t.format(tsFmt)
    if (s <= 0) base
    else {
      val micros = t.getNano / 1000
      val frac = f"$micros%06d"
      base + "." + (if (s <= 6) frac.take(s) else frac.padTo(s, '0'))
    }
  }

  /** Nested (inside array/tuple/map): strings AND date/time values
    * quoted (writeQuoted in the reference quotes DateTime the same as
    * String inside composites), NULL spelled out.
    */
  private def nested(v: Any, zone: java.time.ZoneId): String = v match {
    case null => "NULL"
    case s: String => "'" + escape(s) + "'"
    case b: Array[Byte] => "'" + escape(new String(b, "UTF-8")) + "'"
    case _: Date | _: Timestamp | _: java.time.Instant |
         _: java.time.LocalDate | _: java.time.LocalDateTime =>
      "'" + value(v, quoted = true, zone) + "'"
    case other => value(other, quoted = true, zone)
  }

  private def value(v: Any, quoted: Boolean, zone: java.time.ZoneId): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case d: Double => formatFloat(d)
    // Float32 keeps its own shortest round-trip text (21.99f is
    // "21.99", not the widened double's "21.989999771118164")
    case f: Float => cleanupFloatText(java.lang.Float.toString(f))
    case d: java.math.BigDecimal => formatDecimal(d)
    case d: scala.math.BigDecimal => formatDecimal(d.bigDecimal)
    case d: Date => d.toLocalDate.format(dateFmt)
    case t: Timestamp => tsText(t.toInstant.atZone(zone).toLocalDateTime)
    case t: java.time.Instant => tsText(t.atZone(zone).toLocalDateTime)
    case d: java.time.LocalDate => d.format(dateFmt)
    case d: java.time.LocalDateTime => tsText(d)
    // intervals print as their unit count (CH IntervalSecond 10 → "10");
    // the unit itself is not recoverable from the value, so Duration
    // prints seconds and Period months-or-years — exact for the
    // single-unit intervals the corpus uses
    case d: java.time.Duration =>
      if (d.getNano == 0) d.getSeconds.toString
      else formatFloat(d.getSeconds + d.getNano / 1e9)
    case p: java.time.Period =>
      if (p.getYears != 0 && p.getMonths == 0) p.getYears.toString
      else p.toTotalMonths.toString
    case a: scala.collection.Seq[_] =>
      a.map(nested(_, zone)).mkString("[", ",", "]")
    case a: Array[_] => a.map(nested(_, zone)).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => nested(k, zone) + ":" + nested(x, zone) }
        .mkString("{", ",", "}")
    // CH Time marker struct ({__time: text}): prints as its text —
    // raw at top level, quoted inside composites like any string
    case r: org.apache.spark.sql.Row if isTimeRow(r) =>
      if (quoted) "'" + r.getString(0) + "'" else r.getString(0)
    // BitMap64 marker struct (BitmapCorpusExpr.bitmapStruct): CH prints
    // bitmap values in braces — {1,2,3}
    case r: org.apache.spark.sql.Row if isBitmapRow(r) =>
      r.getSeq[Any](0).map(nested(_, zone)).mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => nested(r.get(i), zone)).mkString("(", ",", ")")
    case other => other.toString
  }

  private def isBitmapRow(r: org.apache.spark.sql.Row): Boolean =
    r.schema != null && r.schema.length == 1 &&
      r.schema.fields(0).name == "__bitmap"

  private def isTimeRow(r: org.apache.spark.sql.Row): Boolean =
    r.schema != null && r.schema.length == 1 &&
      r.schema.fields(0).name == "__time"

  /** ClickHouse float text: shortest round-trip, integral values without
    * a trailing `.0`, lowercase exponent without the redundant `+`.
    */
  def formatFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    cleanupFloatText(java.lang.Double.toString(d))
  }

  private def cleanupFloatText(s: String): String = {
    if (s == "NaN") return "nan"
    if (s == "Infinity") return "inf"
    if (s == "-Infinity") return "-inf"
    val noExp =
      if (s.contains("E")) {
        val Array(m, e) = s.split("E")
        val exp = e.stripPrefix("+").toInt
        // double-conversion ToShortest (the reference's writeFloatText)
        // prints decimal notation for exponents in [-6, 21)
        val digits = m.replace(".", "").replace("-", "").length
        if (exp >= -6 && exp < 21 && digits + math.abs(exp) <= 25)
          new java.math.BigDecimal(m).scaleByPowerOfTen(exp).toPlainString
        else {
          val mm = if (m.endsWith(".0")) m.dropRight(2) else m
          mm + "e" + (if (e.startsWith("-")) e else e.stripPrefix("+"))
        }
      } else s
    if (noExp.endsWith(".0")) noExp.dropRight(2) else noExp
  }

  /** DateTime prints whole seconds; a value carrying sub-second
    * precision prints DateTime64(6)-style with six fractional digits
    * (the engine keeps micros; the declared scale is not recoverable).
    */
  private def tsText(t: java.time.LocalDateTime): String = {
    val base = t.format(tsFmt)
    // millisecond-lattice values print DateTime64(3)-style (the most
    // common declared scale); finer values print all six digits
    if (t.getNano == 0) base
    else if (t.getNano % 1000000 == 0) base + f".${t.getNano / 1000000}%03d"
    else base + f".${t.getNano / 1000}%06d"
  }

  /** ClickHouse trims trailing fractional zeros from Decimal output
    * (writeText for Decimal — "2", not "2.0000").
    */
  private def formatDecimal(d: java.math.BigDecimal): String = {
    val s = d.toPlainString
    if (!s.contains('.')) s
    else {
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t.dropRight(1) else t
    }
  }

  /** TabSeparated escaping: backslash, tab, newline (and CR) escaped;
    * everything else raw.
    */
  private def escape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    // the reference's writeEscapedString escapes single quotes too
    // (SHOW CREATE goldens: \'cnch_default_hdfs\')
    case '\'' => "\\'"
    case '\u0000' => "\\0" // FixedString padding bytes print as \0
    case c => c.toString
  }
}
