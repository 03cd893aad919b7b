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

  /** The toDecimal32/64/128 families bound values by the CONTAINER int
    * (Int32/Int64/Int128), not the precision's digit count (reference
    * src/Core/DecimalFunctions.h DecimalUtils::convertToDecimal —
    * toDecimal32(10.0, 8) holds 10*1e8 < 2^31 although 10 digits exceed
    * precision 9). Spark's widest exact decimal is 38 digits, so the
    * Int128 tail beyond 38 digits raises — documented divergence.
    */
  private def checkDecimalContainer(unscaled: java.math.BigInteger,
      bits: Int): Unit = {
    val max = bits match {
      case 32 => java.math.BigInteger.valueOf(Int.MaxValue)
      case 64 => java.math.BigInteger.valueOf(Long.MaxValue)
      case _ => java.math.BigInteger.ONE.shiftLeft(127)
        .subtract(java.math.BigInteger.ONE)
    }
    if (unscaled.abs.compareTo(max) > 0)
      throw new ArithmeticException(
        s"Decimal value overflows the Decimal$bits container (error 407 analog)")
    if (unscaled.abs.toString.length > 38)
      throw new ArithmeticException(
        "Decimal value exceeds 38 digits (Spark decimal limit)")
  }

  /** Digits the container can produce, capped at Spark's 38. */
  def decimalContainerDigits(bits: Int): Int = bits match {
    case 32 => 10
    case 64 => 19
    case _ => 38
  }

  /** CH float→toDecimalN: the multiply happens in the INPUT float width
    * (a Float32 input promotes the integer scale factor to float32 —
    * 00700_decimal_casts' toFloat32 rows round at float32 granularity),
    * the product truncates toward zero, and the bound is the container.
    */
  def chFloatToDecimal(x: Double, f32: Boolean, bits: Int, s: Int)
      : org.apache.spark.sql.types.Decimal = {
    if (x.isNaN || x.isInfinite)
      throw new ArithmeticException(
        s"cannot convert $x to Decimal$bits (error 407 analog)")
    val product: Double =
      if (f32) (x.toFloat * math.pow(10, s).toFloat).toDouble
      else x * math.pow(10, s)
    if (product.isNaN || product.isInfinite)
      throw new ArithmeticException(
        s"cannot convert $x to Decimal$bits (error 407 analog)")
    val unscaled = new java.math.BigDecimal(product)
      .setScale(0, java.math.RoundingMode.DOWN).toBigIntegerExact
    checkDecimalContainer(unscaled, bits)
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(unscaled, s),
      decimalContainerDigits(bits), s)
  }

  /** CH integer→toDecimalN: x·10^s must fit the container. */
  def chLongToDecimal(x: Long, bits: Int, s: Int)
      : org.apache.spark.sql.types.Decimal = {
    val unscaled = java.math.BigInteger.valueOf(x)
      .multiply(java.math.BigInteger.TEN.pow(s))
    checkDecimalContainer(unscaled, bits)
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(unscaled, s),
      decimalContainerDigits(bits), s)
  }

  /** CH decimal→integer conversion (DecimalUtils::convertTo): truncate
    * toward zero, then RANGE-CHECK the target width — unlike the
    * wrapping integer→integer casts (error 407 on overflow, including
    * any negative value into an unsigned target).
    */
  def chDecimalToInt(d: org.apache.spark.sql.types.Decimal, bits: Int,
      signed: Boolean): Long = {
    val t = d.toJavaBigDecimal.setScale(0, java.math.RoundingMode.DOWN)
    val (lo, hi) =
      if (signed) bits match {
        case 8 => (BigDecimal(Byte.MinValue.toInt), BigDecimal(Byte.MaxValue.toInt))
        case 16 => (BigDecimal(Short.MinValue.toInt), BigDecimal(Short.MaxValue.toInt))
        case 32 => (BigDecimal(Int.MinValue), BigDecimal(Int.MaxValue))
        case _ => (BigDecimal(Long.MinValue), BigDecimal(Long.MaxValue))
      } else bits match {
        case 8 => (BigDecimal(0), BigDecimal(255))
        case 16 => (BigDecimal(0), BigDecimal(65535))
        case 32 => (BigDecimal(0), BigDecimal(4294967295L))
        case _ => (BigDecimal(0), BigDecimal(Long.MaxValue))
      }
    val bd = BigDecimal(t)
    if (bd < lo || bd > hi)
      throw new ArithmeticException(
        s"Decimal value $d overflows ${if (signed) "Int" else "UInt"}$bits " +
          "(error 407 analog)")
    t.longValueExact()
  }

  /** CH decimal rescale core: upscale multiplies the unscaled value
    * inside the container (Decimal32/64 overflow is error 407;
    * Decimal128 WRAPS silently mod 2^128 — the reference skips the
    * overflow check for 128-bit ops, 00700_decimal_casts_2), downscale
    * truncates toward zero. */
  def chDecimalRescale(bd: java.math.BigDecimal, bits: Int, s: Int)
      : java.math.BigDecimal = {
    var u = bd.setScale(s, java.math.RoundingMode.DOWN).unscaledValue
    val max = bits match {
      case 32 => java.math.BigInteger.valueOf(Int.MaxValue)
      case 64 => java.math.BigInteger.valueOf(Long.MaxValue)
      case _ => java.math.BigInteger.ONE.shiftLeft(127)
        .subtract(java.math.BigInteger.ONE)
    }
    if (u.abs.compareTo(max) > 0) {
      if (bits != 128)
        throw new ArithmeticException(
          s"Decimal rescale overflows the Decimal$bits container " +
            "(error 407 analog)")
      val two128 = java.math.BigInteger.ONE.shiftLeft(128)
      val half = java.math.BigInteger.ONE.shiftLeft(127)
      u = u.add(half).mod(two128).subtract(half)
    }
    new java.math.BigDecimal(u, s)
  }

  /** Runtime decimal→decimalN rescale (truncating, container-checked)
    * for representable shapes — Spark's Cast would round HALF_UP where
    * the reference truncates (toDecimal32(0.5555, 2) = 0.55). */
  def chDecimalRescaleChecked(d: org.apache.spark.sql.types.Decimal,
      bits: Int, s: Int): org.apache.spark.sql.types.Decimal = {
    val out = chDecimalRescale(d.toJavaBigDecimal, bits, s)
    if (math.max(out.precision, s) > 38)
      throw new ArithmeticException(
        "Decimal value exceeds 38 digits (Spark decimal limit)")
    org.apache.spark.sql.types.Decimal(out, decimalContainerDigits(bits), s)
  }

  /** Runtime spelling of the rescale for values whose result cannot be
    * a Spark decimal (38-digit limit): the display-exact text,
    * trailing zeros trimmed like the reference's Decimal writeText. */
  def chDecimalRescaleText(d: org.apache.spark.sql.types.Decimal,
      bits: Int, s: Int): org.apache.spark.unsafe.types.UTF8String = {
    val out = chDecimalRescale(d.toJavaBigDecimal, bits, s)
    val t = out.stripTrailingZeros
    val txt = if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
    org.apache.spark.unsafe.types.UTF8String.fromString(txt)
  }

  /** CH decimal ÷ integer: result SCALE = the dividend's scale, value
    * truncated toward zero (reference DecimalBinaryOperation — Spark
    * widens the scale and rounds HALF_UP instead). Division by zero is
    * the reference's error 153. */
  def chDecimalDivInt(a: org.apache.spark.sql.types.Decimal, b: Long,
      bits: Int, s: Int): org.apache.spark.sql.types.Decimal = {
    if (b == 0L) throw new ArithmeticException(
      "Decimal division by zero (error 153 analog)")
    val u = a.toJavaBigDecimal.movePointRight(s).toBigIntegerExact
      .divide(java.math.BigInteger.valueOf(b))
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(u, s), decimalContainerDigits(bits), s)
  }

  /** CH decimal ÷ decimal: scale up the dividend's unscaled value by
    * the divisor's scale INSIDE the result container (error 407 on
    * overflow — `toDecimal128(1,38)/toDecimal128(1,1)`), divide
    * truncating; result scale = the dividend's. */
  def chDecimalDivDec(a: org.apache.spark.sql.types.Decimal,
      b: org.apache.spark.sql.types.Decimal, bits: Int, s1: Int, s2: Int)
      : org.apache.spark.sql.types.Decimal = {
    val bu = b.toJavaBigDecimal.movePointRight(s2).toBigIntegerExact
    if (bu.signum == 0) throw new ArithmeticException(
      "Decimal division by zero (error 153 analog)")
    val scaled = a.toJavaBigDecimal.movePointRight(s1).toBigIntegerExact
      .multiply(java.math.BigInteger.TEN.pow(s2))
    checkDecimalContainer(scaled, bits)
    val u = scaled.divide(bu)
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(u, s1), decimalContainerDigits(bits), s1)
  }

  /** Decimal→UInt64 keeps the full unsigned-64 band exactly: LongType
    * cannot hold (Long.MaxValue, 2^64), so the result is Decimal(20,0)
    * (range-checked truncation, error 407 outside [0, 2^64)). */
  def chDecimalToUInt64(d: org.apache.spark.sql.types.Decimal)
      : org.apache.spark.sql.types.Decimal = {
    val v = d.toJavaBigDecimal.setScale(0, java.math.RoundingMode.DOWN)
      .toBigIntegerExact
    if (v.signum < 0 || v.bitLength > 64)
      throw new ArithmeticException(
        s"Decimal value $d overflows UInt64 (error 407 analog)")
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v), 20, 0)
  }

  /** INSERT-path decimal text read (reference ReadHelpers.h
    * readDecimalText): plain fractional digits beyond the scale
    * TRUNCATE ('0.999990' into Decimal(9,5) stores 0.99999), exponent
    * spellings must be exactly representable at the scale ('1e-10'
    * into Decimal(9,9) is error 69), integer digits beyond p-s are
    * error 69. */
  def chInsertDecimal(x: org.apache.spark.unsafe.types.UTF8String,
      p: Int, s: Int): org.apache.spark.sql.types.Decimal = {
    val text = x.toString.trim
    val bd0 = new java.math.BigDecimal(text)
    val bd = bd0.setScale(s, java.math.RoundingMode.DOWN)
    val hasExp = text.indexOf('e') >= 0 || text.indexOf('E') >= 0
    if (hasExp && bd.compareTo(bd0) != 0)
      throw new ArithmeticException(
        s"Decimal value $text is not representable at scale $s (error 69 analog)")
    if (bd.precision - bd.scale > p - s)
      throw new ArithmeticException(
        s"Decimal value $text is out of range of Decimal($p, $s) (error 69 analog)")
    org.apache.spark.sql.types.Decimal(bd, p, s)
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
