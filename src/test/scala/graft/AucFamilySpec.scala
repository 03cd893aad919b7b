package graft

import graft.aggregates.AucFamily
import org.apache.spark.sql.functions._
import scala.util.Random

/** Gates for the AUC aggregate family: differential (distributed plan vs
  * direct pairwise brute force on random data) for the deterministic
  * bucketed/pair-exact variants, and hand-traced single-stream cases for
  * the arrival-order fastAuc heuristic.
  */
class AucFamilySpec extends SparkSpec {
  import spark.implicits._

  /** Pairwise Mann-Whitney AUC over bucket indexes (ties = half credit),
    * optionally weighted — the quantity BucketedRankAucAgg computes.
    */
  private def bruteBucketAuc(
      rows: Seq[(Double, Double, Double)],
      precision: Double, min: Double, max: Double): Double = {
    val bn = math.ceil((max - min) / precision).toInt
    def bucket(p: Double): Int =
      math.min(math.max(((p - min) / precision).toLong, 0L), (bn - 1).toLong).toInt
    val pos = rows.filter(_._2 > 0).map(r => (bucket(r._1), r._3))
    val neg = rows.filter(_._2 <= 0).map(r => (bucket(r._1), r._3))
    val totP = pos.map(_._2).sum
    val totN = neg.map(_._2).sum
    if (totP == 0 || totN == 0) return 1.0
    var acc = 0.0
    for ((bp, wp) <- pos; (bn2, wn) <- neg) {
      if (bp > bn2) acc += wp * wn
      else if (bp == bn2) acc += wp * wn / 2.0
    }
    acc / totP / totN
  }

  /** Direct unordered-pair enumeration of the regAuc flag formulas
    * (RegAucV2.h:93 comment block).
    */
  private def bruteRegAuc(rows: Seq[(Double, Double)], flag: Int): Double = {
    var conc = 0L; var tieBoth = 0L; var tieLabel = 0L; var total = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (pa, la) = rows(i); val (pb, lb) = rows(j)
      total += 1
      if ((pa > pb && la > lb) || (pa < pb && la < lb)) conc += 1
      if (pa == pb && la == lb) tieBoth += 1
      if (la == lb) tieLabel += 1
    }
    val (correct, denom) = flag match {
      case 1 => (conc + tieBoth, total)
      case 2 => (conc + tieLabel, total)
      case 3 => (conc, total)
      case 4 => (conc, total - tieLabel)
    }
    if (denom <= 0) -1.0 else correct.toDouble / denom
  }

  test("bucketed-rank AUC matches pairwise brute force across partitionings") {
    val rnd = new Random(13)
    (0 until 3).foreach { trial =>
      val rows = Seq.fill(400 + rnd.nextInt(200))((
        rnd.nextInt(1000) / 1000.0,
        if (rnd.nextBoolean()) 1.0 else 0.0,
        1.0))
      val df = rows.toDF("p", "l", "w").repartition(7)
      val got = df.agg(AucFamily.fastAuc2(col("p"), col("l"), 0.01)).head.getDouble(0)
      val want = bruteBucketAuc(rows, 0.01, 0.0, 1.0)
      assert(math.abs(got - want) < 1e-12, s"trial $trial: $got vs $want")
    }
  }

  test("debiasAuc weights rows by 1/sample_rate") {
    val rnd = new Random(17)
    val rows = Seq.fill(300)((
      rnd.nextInt(100) / 100.0,
      if (rnd.nextInt(3) == 0) 1.0 else 0.0,
      if (rnd.nextBoolean()) 0.5 else 0.25))
    val df = rows.toDF("p", "l", "sr").repartition(5)
    val got = df.agg(AucFamily.debiasAuc(col("p"), col("l"), col("sr"), 0.01))
      .head.getDouble(0)
    val want = bruteBucketAuc(rows.map(r => (r._1, r._2, 1.0 / r._3)), 0.01, 0.0, 1.0)
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }

  test("bucketed AUC edge cases: single class is 1.0, perfect separation") {
    val onlyPos = Seq((0.9, 1.0, 1.0), (0.1, 1.0, 1.0))
    assert(onlyPos.toDF("p", "l", "w")
      .agg(AucFamily.fastAuc2(col("p"), col("l"), 0.01)).head.getDouble(0) === 1.0)
    // all positives in higher buckets than all negatives → AUC 1
    val sep = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
    assert(sep.toDF("p", "l")
      .agg(AucFamily.fastAuc2(col("p"), col("l"), 0.01)).head.getDouble(0) === 1.0)
    // positives and negatives in the SAME bucket → all ties → 0.5
    val tied = Seq((0.501, 1.0), (0.505, 0.0), (0.509, 1.0), (0.503, 0.0))
    assert(tied.toDF("p", "l")
      .agg(AucFamily.fastAuc2(col("p"), col("l"), 0.01)).head.getDouble(0) === 0.5)
  }

  test("regAuc flags 1-4 match brute force, with ties, across partitionings") {
    val rnd = new Random(19)
    (0 until 3).foreach { trial =>
      // small integer domains force pred/label/both ties
      val rows = Seq.fill(120)((rnd.nextInt(12).toDouble, rnd.nextInt(5).toDouble))
      val df = rows.toDF("p", "l").repartition(6)
      (1 to 4).foreach { flag =>
        val got = df.agg(AucFamily.regAuc(col("p"), col("l"), flag)).head.getDouble(0)
        val want = bruteRegAuc(rows, flag)
        assert(math.abs(got - want) < 1e-12, s"trial $trial flag $flag: $got vs $want")
      }
    }
  }

  test("regAuc degenerate groups return -1") {
    // n=1 → no pairs
    assert(Seq((1.0, 1.0)).toDF("p", "l")
      .agg(AucFamily.regAuc(col("p"), col("l"), 1)).head.getDouble(0) === -1.0)
    // flag 4 with all labels equal → empty denominator
    assert(Seq((1.0, 2.0), (3.0, 2.0), (2.0, 2.0)).toDF("p", "l")
      .agg(AucFamily.regAuc(col("p"), col("l"), 4)).head.getDouble(0) === -1.0)
  }

  test("ecpmAuc hand-traced bucket walk") {
    // precision 0.25 → 4 buckets; min=-2.5 max=2.5 → divisor 0.25*5=1.25.
    // bucket = ⌊(2.5 − log10(e))/1.25⌋: log10=2 → 0; log10=1 → 1;
    // log10=0 → 2; log10=−1 → ⌊2.8⌋ = 2 (shares the third bucket).
    val rows = Seq(
      (100.0, 10.0), // bucket 0 (best ecpm), adv 10
      (10.0, 1.0),   // bucket 1, adv 1
      (1.0, 5.0),    // bucket 2, adv 5
      (0.1, 2.0))    // bucket 2, adv 2
    // walk: b0: lb+=1·0=0,  cum=(1,10); ub+=1·10 → 10
    //       b1: lb+=1·10,   cum=(2,11); ub+=1·11 → 21
    //       b2: lb+=2·11→32, cum=(4,18); ub+=2·18 → 57
    // result = (32+57)/(2·4·18) = 89/144
    val got = rows.toDF("e", "a")
      .agg(AucFamily.ecpmAuc(col("e"), col("a"), 0.25)).head.getDouble(0)
    assert(math.abs(got - 89.0 / 144.0) < 1e-12, s"got $got")
  }

  test("fastAuc hand-traced classification stream") {
    // (0.8,1): no neg yet; (0.4,0): 0.4<0.8 → +; (0.6,1): 0.6>0.4 → +;
    // (0.7,0): !(0.7<0.6) → −; (0.9,1): 0.9>0.7 → +  ⇒ 3/4
    val rows = Seq((0.8, 1.0), (0.4, 0.0), (0.6, 1.0), (0.7, 0.0), (0.9, 1.0))
    val got = rows.toDF("p", "l").coalesce(1)
      .agg(AucFamily.fastAuc(col("p"), col("l"))).head.getDouble(0)
    assert(got === 0.75, s"got $got")
    // empty comparison set → 1.0
    val one = Seq((0.5, 1.0)).toDF("p", "l")
      .agg(AucFamily.fastAuc(col("p"), col("l"))).head.getDouble(0)
    assert(one === 1.0)
  }

  test("fastAuc hand-traced regression stream") {
    // rows vs previous: (0.2,2)≥(0.1,1) → +; (0.15,3): pred drops → −;
    // (0.3,4)≥(0.15,3) → +  ⇒ 2/3
    val rows = Seq((0.1, 1.0), (0.2, 2.0), (0.15, 3.0), (0.3, 4.0))
    val got = rows.toDF("p", "l").coalesce(1)
      .agg(AucFamily.fastAuc(col("p"), col("l"), isRegression = true))
      .head.getDouble(0)
    assert(math.abs(got - 2.0 / 3.0) < 1e-12, s"got $got")
  }

  test("SQL spellings: params-first flattening and defaults") {
    Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("p", "l")
      .createOrReplaceTempView("auc_t")
    val r = spark.sql("""
      SELECT fastAuc2(p, l) AS a_default,
             fastAuc2(0.01, p, l) AS a_prec,
             fastAuc3(0.01, 0.0, 1.0, p, l) AS a_full,
             fastPrevAuc2(p, l) AS a_prev,
             regAuc(p, l) AS a_reg,
             regAucV2(10000, 1, p, l) AS a_regv2,
             fastAuc(p, l) AS a_stream
      FROM auc_t""").head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 1.0)
    // 6 pairs: 4 concordant, 2 label-ties, 0 both-ties → flag1 = 4/6
    assert(math.abs(r.getDouble(4) - 4.0 / 6.0) < 1e-12)
    assert(r.getDouble(5) === r.getDouble(4))
  }
}
