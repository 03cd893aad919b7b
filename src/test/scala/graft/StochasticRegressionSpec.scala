package graft

import graft.aggregates.StochasticRegressionAgg
import scala.util.Random

/** Gates for the stochastic regression aggregates: single-stream
  * differential against a direct replica of the reference algorithm
  * (mini-batch flush points, trailing-batch drop, updater math), unit
  * merge checks of the frac-weighted blend, and evalMLMethod exactness.
  */
class StochasticRegressionSpec extends SparkSpec {
  import spark.implicits._

  /** Direct replica: feed rows in order through a Model (the same code
    * path Spark uses, but without partial/final plumbing) and apply the
    * empty-final merge Spark always performs.
    */
  private def direct(
      rows: Seq[(Double, Seq[Double])], isLogistic: Boolean,
      lr: Double, l2: Double, batch: Long, updater: String): (Array[Double], Double) = {
    val m = new StochasticRegressionAgg.Model(
      rows.head._2.size, isLogistic, lr, l2, batch, updater)
    rows.foreach { case (t, x) => m.add(t, x.toArray) }
    val fin = new StochasticRegressionAgg.Model(
      rows.head._2.size, isLogistic, lr, l2, batch, updater)
    fin.mergeFrom(m)
    (fin.weights, fin.bias)
  }

  private def trainSql(
      view: String, call: String): (Seq[Double], Double) = {
    val arr = spark.sql(s"SELECT $call AS w FROM $view").head
      .getSeq[Double](0)
    (arr.dropRight(1), arr.last)
  }

  test("single-stream differential matches the direct replica, all updaters") {
    val rnd = new Random(31)
    val rows = Seq.fill(200)((
      rnd.nextDouble() * 4 - 2,
      Seq(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)))
    rows.map { case (t, f) => (t, f.head, f(1)) }.toDF("y", "x1", "x2")
      .coalesce(1).createOrReplaceTempView("ml_t")
    for (updater <- Seq("SGD", "Momentum", "Nesterov", "Adam")) {
      val (gw, gb) = trainSql("ml_t",
        s"stochasticLinearRegression(0.05, 0.1, 10, '$updater', y, x1, x2)")
      val (ww, wb) = direct(rows, isLogistic = false, 0.05, 0.1, 10, updater)
      gw.zip(ww).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-12, s"$updater weight: $g vs $w") }
      assert(math.abs(gb - wb) < 1e-12, s"$updater bias: $gb vs $wb")
    }
    // logistic path (labels ±1 per the reference's target·z formulation)
    val logRows = rows.map { case (t, f) => (if (t > 0) 1.0 else -1.0, f) }
    logRows.map { case (t, f) => (t, f.head, f(1)) }.toDF("y", "x1", "x2")
      .coalesce(1).createOrReplaceTempView("ml_l")
    val (gw, gb) = trainSql("ml_l",
      "stochasticLogisticRegression(0.05, 0.1, 10, 'SGD', y, x1, x2)")
    val (ww, wb) = direct(logRows, isLogistic = true, 0.05, 0.1, 10, "SGD")
    gw.zip(ww).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    assert(math.abs(gb - wb) < 1e-12)
  }

  test("trailing partial batch never updates weights (reference drop semantics)") {
    // 7 rows, batch 5 → exactly one update from the first 5 rows; rows
    // 6-7 are dropped, so adding them changes nothing.
    val rnd = new Random(37)
    val base = Seq.fill(5)((rnd.nextDouble(), Seq(rnd.nextDouble())))
    val extra = Seq.fill(2)((rnd.nextDouble(), Seq(rnd.nextDouble())))
    val (w1, b1) = direct(base, isLogistic = false, 0.1, 0.0, 5, "SGD")
    val (w2, b2) = direct(base ++ extra, isLogistic = false, 0.1, 0.0, 5, "SGD")
    assert(w1.toSeq === w2.toSeq)
    assert(b1 === b2)
  }

  test("mergeFrom blends with frac = iter^2 / (iter^2 + rhsIter^2)") {
    def trained(seed: Int, n: Int): StochasticRegressionAgg.Model = {
      val rnd = new Random(seed)
      val m = new StochasticRegressionAgg.Model(1, false, 0.1, 0.0, 5, "SGD")
      (0 until n).foreach { _ => m.add(rnd.nextDouble(), Array(rnd.nextDouble())) }
      m
    }
    val a = trained(41, 25) // 5 iterations
    val b = trained(43, 10) // 2 iterations
    val (aw, ab, ai) = (a.weights(0), a.bias, a.iterNum)
    val (bw, bb) = (b.weights(0), b.bias)
    assert(ai === 5L && b.iterNum === 2L)
    val frac = (5.0 * 5) / (5.0 * 5 + 2.0 * 2)
    a.mergeFrom(b)
    assert(math.abs(a.weights(0) - (aw * frac + bw * (1 - frac))) < 1e-15)
    assert(math.abs(a.bias - (ab * frac + bb * (1 - frac))) < 1e-15)
    assert(a.iterNum === 7L)
  }

  test("single-pass Adam recovers a clean linear trend directionally") {
    // y = 3x + 2, no noise; single pass, defaults-scale lr. Deterministic
    // (fixed seed, one partition), asserted loosely — SGD-family training
    // is a heuristic, the exactness gate is the differential above.
    val rnd = new Random(47)
    val rows = Seq.fill(1500) { val x = rnd.nextDouble() * 2 - 1; (3 * x + 2, x) }
    rows.toDF("y", "x").coalesce(1).createOrReplaceTempView("ml_c")
    val (w, b) = trainSql("ml_c",
      "stochasticLinearRegression(0.5, 0.0, 10, 'Adam', y, x)")
    assert(w.head > 1.0, s"slope ${w.head} should move toward 3")
    assert(b > 1.0, s"bias $b should move toward 2")
  }

  test("evalMLMethod applies [weights..., bias] exactly, sigmoid variant too") {
    val r = spark.sql("""
      SELECT evalMLMethod(array(2.0d, 3.0d, -1.0d, 5.0d), 1.0, 2.0, 4.0) AS lin,
             evalMLMethodSigmoid(array(1.0d, 0.0d), 0.0) AS sig""").head
    // 5 + 2·1 + 3·2 − 1·4 = 9
    assert(r.getDouble(0) === 9.0)
    // sigmoid(0 + 1·0 … bias 0) = 0.5
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-15)
  }
}
