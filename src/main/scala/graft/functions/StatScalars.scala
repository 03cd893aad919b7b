package graft.functions

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.spark.sql.catalyst.InternalRow

/** A/B-test sample-size scalars (reference src/Functions/minSampleSize
  * .cpp:84-282): both return Tuple(minimum_sample_size,
  * detect_range_lower, detect_range_upper); invalid inputs yield NaNs
  * like the reference. Normal quantiles via commons-math3 (bundled with
  * Spark) — the same Φ⁻¹ boost::math evaluates there.
  */
object StatScalars {

  private val nd = new NormalDistribution(0.0, 1.0)

  // minSampleSize.cpp:77-80: in (0, 1) with an epsilon off both ends
  private val DblEps = 2.220446049250313e-16
  private def between01(v: Double): Boolean =
    v >= 0.0 && v <= 1.0 && math.abs(v) >= DblEps && math.abs(v - 1.0) >= DblEps

  private def nanRow: InternalRow =
    InternalRow(Double.NaN, Double.NaN, Double.NaN)

  /** minSampleSizeContinous: 2σ²(Z₁₋ₐ/₂ + Z_power)² / Δ², Δ = baseline·mde. */
  def minSampleSizeContinous(
      baseline: Double, sigma: Double, mde: Double,
      power: Double, alpha: Double): InternalRow = {
    if (!java.lang.Double.isFinite(baseline) || !java.lang.Double.isFinite(sigma) ||
      !between01(mde) || !between01(power) || !between01(alpha)) return nanRow
    val delta = baseline * mde
    val z = nd.inverseCumulativeProbability(1.0 - alpha / 2.0) +
      nd.inverseCumulativeProbability(power)
    InternalRow(
      2.0 * sigma * sigma * z * z / (delta * delta),
      baseline - delta, baseline + delta)
  }

  /** minSampleSizeConversion: (Z₁₋ₐ/₂·√(2p̄q̄) + Z_power·√(p₁q₁+p₂q₂))² / mde². */
  def minSampleSizeConversion(
      p1: Double, mde: Double, power: Double, alpha: Double): InternalRow = {
    if (!java.lang.Double.isFinite(p1) ||
      !between01(mde) || !between01(power) || !between01(alpha)) return nanRow
    val q1 = 1.0 - p1
    val p2 = p1 + mde
    val q2 = 1.0 - p2
    val pBar = (p1 + p2) / 2.0
    val qBar = 1.0 - pBar
    val num = nd.inverseCumulativeProbability(1.0 - alpha / 2.0) *
      math.sqrt(2.0 * pBar * qBar) +
      nd.inverseCumulativeProbability(power) * math.sqrt(p1 * q1 + p2 * q2)
    InternalRow(num * num / (mde * mde), p1 - mde, p1 + mde)
  }
}
