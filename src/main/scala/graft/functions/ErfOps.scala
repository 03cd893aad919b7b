package graft.functions

/** Double-precision error function pair for the dialect registry
  * (reference FunctionMathUnary erf/erfc,
  * /root/reference/src/Functions/erf.cpp, erfc.cpp — there via libm).
  * The JVM has no libm erf, so: Taylor series around 0 for moderate
  * arguments (converges to ~1e-15 for |x| < 3) and a Lentz-evaluated
  * continued fraction for the complementary tail — both classical
  * public-domain numerics (Abramowitz & Stegun 7.1.5 / 7.1.14).
  * Static methods so Catalyst can call them via StaticInvoke from
  * generated code (same pattern as MediaCodecs/CodingOps).
  */
object ErfOps {

  private val twoOverSqrtPi = 2.0 / math.sqrt(math.Pi)

  def erf(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    val ax = math.abs(x)
    val v =
      if (ax < 3.0) erfSeries(ax)
      else 1.0 - erfcTail(ax)
    if (x < 0) -v else v
  }

  def erfc(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0) 2.0 - erfc(-x)
    else if (x < 3.0) 1.0 - erfSeries(x)
    else erfcTail(x)
  }

  /** A&S 7.1.5: erf(x) = 2/√π Σ (−1)ⁿ x^(2n+1) / (n!(2n+1)). */
  private def erfSeries(ax: Double): Double = {
    var term = ax
    var sum = ax
    var n = 0
    while (math.abs(term / (2 * n + 1)) > 1e-18 * math.abs(sum) && n < 300) {
      n += 1
      term *= -ax * ax / n
      sum += term / (2 * n + 1)
    }
    twoOverSqrtPi * sum
  }

  /** A&S 7.1.14 continued fraction via modified Lentz, x ≥ 3:
    * erfc(x) = exp(−x²)/(x√π) · 1/(1+ (1/2x²)/(1+ (2/2x²)/(1+ …))).
    */
  private def erfcTail(x: Double): Double = {
    if (x > 27.0) return 0.0 // exp(-x²) underflows double
    val tiny = 1e-300
    var f = tiny
    var c = f
    var d = 0.0
    var n = 0
    var delta = 0.0
    do {
      n += 1
      // continued-fraction coefficients: b_n = 1, a_n = n / (2x²) with
      // a_1-level handled by the leading factor
      val a = if (n == 1) 1.0 else (n - 1) / (2.0 * x * x)
      val b = 1.0
      d = b + a * d
      if (d == 0.0) d = tiny
      c = b + a / c
      if (c == 0.0) c = tiny
      d = 1.0 / d
      delta = c * d
      f *= delta
    } while (math.abs(delta - 1.0) > 1e-16 && n < 300)
    math.exp(-x * x) / (x * math.sqrt(math.Pi)) * f
  }
}
