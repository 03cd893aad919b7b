package graft.functions

/** Pure-JVM scalar math helpers invoked from codegen via StaticInvoke
  * (same pattern as ErfOps). Mirrors the reference's libm-backed scalar
  * functions (/root/reference/src/Functions/gcd.cpp, lcm.cpp,
  * FunctionMathUnary.h lgamma/tgamma): gcd/lcm on 64-bit integers with
  * the sign conventions of std::gcd/lcm, and the log-gamma pair via the
  * Lanczos approximation (g=7, n=9 — double-precision accurate).
  */
object MathOps {

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) 0L
    else math.abs(a / gcd(a, b) * b)
  }

  private val lanczosG = 7.0
  private val lanczosCoef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** ln|Γ(x)| — matches std::lgamma over the real line. */
  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x.isInfinite) return Double.PositiveInfinity
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      if (x == math.rint(x)) return Double.PositiveInfinity // poles at 0, -1, -2…
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var sum = lanczosCoef(0)
      var i = 1
      while (i < lanczosCoef.length) { sum += lanczosCoef(i) / (z + i); i += 1 }
      val t = z + lanczosG + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(sum)
    }
  }

  /** IEEE-754 double division: 1/0 = inf, 0/0 = nan — the reference's
    * Float64 `/` (ANSI-mode Divide would error, LEGACY returns NULL).
    */
  def ieeeDiv(a: Double, b: Double): Double = a / b

  /** parseTimeDelta (reference src/Functions/parseTimeDelta.cpp):
    * free-text "1yr2mo", "11hr 25min 3.1s" → seconds, with the
    * reference's unit table (year = 365 d, month = 30.5 d).
    */
  def parseTimeDelta(s: org.apache.spark.unsafe.types.UTF8String): Double =
    parseTimeDelta(s.toString)

  def parseTimeDelta(s: String): Double = {
    var total = 0.0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !s.charAt(i).isDigit && s.charAt(i) != '.') i += 1
      if (i < n) {
        val numStart = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val value = s.substring(numStart, i).toDouble
        while (i < n && (s.charAt(i).isWhitespace || s.charAt(i) == '-')) i += 1
        val unitStart = i
        while (i < n && s.charAt(i).isLetter) i += 1
        val unit = s.substring(unitStart, i).toLowerCase
        val mult = unit match {
          case "ns" | "nanosecond" | "nanoseconds" => 1e-9
          case "us" | "microsecond" | "microseconds" => 1e-6
          case "ms" | "millisecond" | "milliseconds" => 1e-3
          case "" | "s" | "sec" | "secs" | "second" | "seconds" => 1.0
          case "m" | "min" | "mins" | "minute" | "minutes" => 60.0
          case "h" | "hr" | "hrs" | "hour" | "hours" => 3600.0
          case "d" | "day" | "days" => 86400.0
          case "w" | "wk" | "week" | "weeks" => 7.0 * 86400.0
          case "mo" | "mon" | "month" | "months" => 30.5 * 86400.0
          case "y" | "yr" | "year" | "years" => 365.0 * 86400.0
          case other => throw new IllegalArgumentException(
            s"parseTimeDelta: unknown unit '$other' in '$s'")
        }
        total += value * mult
      }
    }
    total
  }

  /** Γ(x) — matches std::tgamma (signed, poles at non-positive ints). */
  def tgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x == Double.PositiveInfinity) return Double.PositiveInfinity
    if (x <= 0.0 && x == math.rint(x)) return Double.NaN
    if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * tgamma(1.0 - x))
    else {
      val lg = lgamma(x)
      math.exp(lg)
    }
  }

  /** CH float→Decimal conversion truncates toward zero (reference
    * src/Core/DecimalFunctions.h DecimalUtils — multiply by the scale
    * factor, static_cast), where Spark's Cast rounds HALF_UP. Range
    * overflow raises, matching NUMERIC_VALUE_OUT_OF_RANGE.
    */
  def doubleToDecimal(x: Double, p: Int, s: Int): org.apache.spark.sql.types.Decimal = {
    if (x.isNaN || x.isInfinite)
      throw new ArithmeticException(s"cannot convert $x to Decimal($p, $s)")
    // the reference computes `value * scaleMultiplier` in DOUBLE (one
    // IEEE rounding) and then static_casts — truncation of the PRODUCT,
    // not of the exact value (315.08 at scale 12 stays 315.08 because
    // the product rounds to 3.1508e14 before the cast)
    val out = x * math.pow(10, s)
    val bd = new java.math.BigDecimal(out)
      .setScale(0, java.math.RoundingMode.DOWN)
      .movePointLeft(s)
    if (bd.abs.compareTo(java.math.BigDecimal.TEN.pow(p - s)) >= 0)
      throw new ArithmeticException(
        s"Decimal value $x is out of range of Decimal($p, $s)")
    org.apache.spark.sql.types.Decimal(bd.setScale(s), p, s)
  }

  /** MySQL TO_DAYS: days since year 0 for flexible date spellings —
    * 6-digit YYMMDD (00-69 → 2000s, 70-99 → 1900s), 8-digit YYYYMMDD,
    * or ISO; epoch day 0 = 719528 (from_days uses the same offset).
    */
  def mysqlToDays(s0: org.apache.spark.unsafe.types.UTF8String): Long = {
    val t = s0.toString.trim
    val d =
      if (t.length == 6 && t.forall(_.isDigit)) {
        val yy = t.substring(0, 2).toInt
        val y = if (yy < 70) 2000 + yy else 1900 + yy
        java.time.LocalDate.of(y, t.substring(2, 4).toInt, t.substring(4).toInt)
      } else if (t.length == 8 && t.forall(_.isDigit))
        java.time.LocalDate.of(t.substring(0, 4).toInt,
          t.substring(4, 6).toInt, t.substring(6).toInt)
      else java.time.LocalDate.parse(t.take(10))
    d.toEpochDay + 719528L
  }

  /** CH String→Decimal conversion: full-precision parse, TRUNCATE extra
    * fractional digits toward zero (readDecimalText reads only `scale`
    * fractional digits), range overflow raises (error 69 analog).
    */
  def stringToDecimal(x: org.apache.spark.unsafe.types.UTF8String,
      p: Int, s: Int): org.apache.spark.sql.types.Decimal = {
    val bd = new java.math.BigDecimal(x.toString.trim)
      .setScale(s, java.math.RoundingMode.DOWN)
    if (bd.precision - bd.scale > p - s)
      throw new ArithmeticException(
        s"Decimal value $x is out of range of Decimal($p, $s)")
    org.apache.spark.sql.types.Decimal(bd, p, s)
  }
}
