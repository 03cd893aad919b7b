package graft

import graft.aggregates.WeightedQuantileAgg
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential gate for the weighted quantile aggregates: the
  * distributed plan (partitioned update + merge) must reproduce a
  * direct single-pass evaluation of the reference formulas on random
  * data — the partition-merge path is what a unit trace can't cover.
  */
class WeightedQuantileSpec extends SparkSpec {
  import spark.implicits._

  /** QuantileInterpolatedWeighted.h getImpl, directly. */
  private def bruteInterpolated(
      pairs: Seq[(Double, Double)], level: Double): Double = {
    val merged = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val size = merged.size
    val sumW = merged.map(_._2).sum
    var cum = 0.0
    val x = merged.map { case (_, w) => cum += w; (cum - 0.5 * w) / sumW }
    var idx = 0
    if (size >= 2) {
      if (level >= x(size - 2)) idx = size - 2
      else while (idx < size - 2 && level > x(idx + 1)) idx += 1
    }
    val u = if (idx + 1 < size) idx + 1 else idx
    val (xl, xr) = (x(idx), x(u))
    var (yl, yr) = (merged(idx)._1, merged(u)._1)
    if (level < xl) yr = yl
    if (level > xr) yl = yr
    val dx = if (xr - xl == 0) 1.0 else xr - xl
    yl + (yr - yl) / dx * (level - xl)
  }

  /** QuantileBFloat16Histogram.h getImpl, directly. */
  private def bruteBf16(pairs: Seq[(Double, Double)], level: Double): Double = {
    def bf16(v: Double): Float =
      java.lang.Float.intBitsToFloat(
        (java.lang.Float.floatToRawIntBits(v.toFloat) >>> 16) << 16)
    val hist = pairs.groupBy(p => bf16(p._1)).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val sumW = hist.map(_._2).sum
    val threshold = math.ceil(sumW * level)
    var acc = 0.0
    hist.find { case (_, w) => acc += w; acc >= threshold }
      .map(_._1.toDouble).getOrElse(hist.last._1.toDouble)
  }

  test("interpolated weighted quantile matches brute force across partitionings") {
    val rnd = new Random(7)
    (0 until 3).foreach { trial =>
      val pairs = Seq.fill(300 + rnd.nextInt(300))(
        (rnd.nextInt(40).toDouble, (rnd.nextInt(5) + 1).toDouble))
      val df = pairs.toDF("x", "w").repartition(7)
      Seq(0.1, 0.5, 0.9).foreach { p =>
        val got = df.agg(
          WeightedQuantileAgg.quantileInterpolatedWeighted(col("x"), col("w"), p))
          .collect()(0).getDouble(0)
        val want = bruteInterpolated(pairs, p)
        assert(math.abs(got - want) < 1e-9, s"trial $trial p=$p: $got vs $want")
      }
    }
  }

  test("bfloat16 quantile matches brute force across partitionings") {
    val rnd = new Random(11)
    (0 until 3).foreach { trial =>
      val pairs = Seq.fill(400)(
        (rnd.nextDouble() * 1000, (rnd.nextInt(4) + 1).toDouble))
      val df = pairs.toDF("x", "w").repartition(5)
      Seq(0.25, 0.5, 0.75).foreach { p =>
        val got = df.agg(
          WeightedQuantileAgg.quantileBFloat16Weighted(col("x"), col("w"), p))
          .collect()(0).getDouble(0)
        val want = bruteBf16(pairs, p)
        assert(got === want, s"trial $trial p=$p: $got vs $want")
      }
    }
  }
}
