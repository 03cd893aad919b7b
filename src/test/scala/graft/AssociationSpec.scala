package graft

import graft.operators.Association
import org.apache.spark.sql.functions._
import scala.util.Random

/** Brute-force differential for the cross-tab association statistics:
  * the DataFrame plan must reproduce a direct Scala evaluation of the
  * reference formulas (CrossTab.h getPhiSquared + the four getResult
  * variants) on random categorical data — independent of the DuckDB
  * oracle's single dataset.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pairs: Seq[(String, String)]): (Double, Double, Double, Double) = {
    val n = pairs.size.toDouble
    val ab = pairs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val a = pairs.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val b = pairs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val phi2 = ab.map { case ((x, y), nab) =>
      val e = a(x) * b(y) / n
      (nab - e) * (nab - e) / e
    }.sum / n
    val (ka, kb) = (a.size.toDouble, b.size.toDouble)
    val cramers = math.sqrt(phi2 / (math.min(ka, kb) - 1))
    val phi2c = math.max(0.0, phi2 - (ka - 1) * (kb - 1) / (n - 1))
    val corrA = ka - (ka - 1) * (ka - 1) / (n - 1)
    val corrB = kb - (kb - 1) * (kb - 1) / (n - 1)
    val cramersBc = math.sqrt(phi2c / (math.min(corrA, corrB) - 1))
    val ha = a.values.map(v => v / n * math.log(v / n)).sum
    val dep = ab.map { case ((_, y), nab) => nab / n * math.log(nab / b(y)) }.sum
    val theils = (dep - ha) / ha
    val contingency = math.sqrt(phi2 / (phi2 + n))
    (cramers, cramersBc, theils, contingency)
  }

  test("crossTabStats matches brute-force reference formulas on random data") {
    val rnd = new Random(42)
    (0 until 3).foreach { trial =>
      val ka = 3 + rnd.nextInt(4)
      val kb = 2 + rnd.nextInt(5)
      val pairs = Seq.fill(400 + rnd.nextInt(400)) {
        // mild dependence so the statistics aren't all ≈0
        val i = rnd.nextInt(ka)
        val j = if (rnd.nextBoolean()) i % kb else rnd.nextInt(kb)
        (s"a$i", s"b$j")
      }
      val df = pairs.toDF("x", "y").repartition(5)
      val row = Association.crossTabStats(df, col("x"), col("y")).collect()(0)
      val (cv, cvbc, tu, cont) = brute(pairs)
      // statistics ship as fixed-format 4-decimal strings — double
      // byte representations are not hash-stable across engine builds,
      // and 6 decimals sat on a libm-ulp knife edge vs the oracle
      def dec(name: String): Double = row.getAs[String](name).toDouble
      assert(math.abs(dec("cramers_v") - cv) < 1e-4, s"cramers_v trial $trial")
      assert(math.abs(dec("cramers_v_bc") - cvbc) < 1e-4, s"cramers_v_bc trial $trial")
      assert(math.abs(dec("theils_u") - tu) < 1e-4, s"theils_u trial $trial")
      assert(math.abs(dec("contingency") - cont) < 1e-4, s"contingency trial $trial")
    }
  }
}
