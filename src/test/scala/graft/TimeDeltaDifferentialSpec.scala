package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential for formatReadableTimeDelta: the Catalyst expression
  * tree (floor-divide chains + separator logic) against a direct Scala
  * transliteration of the reference's processUnit loop
  * (formatReadableTimeDelta.cpp:157) over random and adversarial
  * values — zero intermediate units, exact unit boundaries, negatives,
  * and the " and " placement are where a hand-built tree goes wrong.
  */
class TimeDeltaDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val units = Seq(
    31536000.0 -> " year", 2635200.0 -> " month", 86400.0 -> " day",
    3600.0 -> " hour", 60.0 -> " minute", 1.0 -> " second")

  /** processUnit, directly. */
  private def brute(value0: Double): String = {
    val sb = new StringBuilder
    var value = math.abs(value0)
    if (value0 < 0) sb.append('-')
    var hasOutput = false
    units.foreach { case (size, name) =>
      val n = (value / size).toLong
      if (n != 0 || (size == 1.0 && !hasOutput)) {
        value -= n * size
        if (hasOutput) sb.append(if (value < 1) " and " else ", ")
        sb.append(n).append(name)
        if (n != 1) sb.append('s')
        hasOutput = true
      } else {
        value -= n * size
      }
    }
    sb.toString
  }

  test("expression tree matches the reference loop on adversarial values") {
    val rnd = new Random(13)
    val edge = Seq(0L, 1L, 59L, 60L, 61L, 3599L, 3600L, 3661L, 86400L,
      86460L, 2635200L, 2635260L, 31536000L, 31536061L, 34257661L,
      -90L, -31536000L, 126144000L)
    val random = Seq.fill(60)(rnd.nextLong() % 200000000L)
    val vals = (edge ++ random).distinct
    val got = vals.toDF("v")
      .selectExpr("v", "formatReadableTimeDelta(v) AS s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    vals.foreach { v =>
      assert(got(v) === brute(v.toDouble), s"value $v")
    }
  }
}
