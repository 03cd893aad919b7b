package graft

import graft.aggregates.FinderFunnelAgg
import org.apache.spark.sql.functions._

/** Differential gate for finderFunnel: a naive exponential chain search
  * (spec-derived: deepest chain with non-decreasing timestamps starting at
  * a step-1 event in the slot, completing within the window) vs the
  * engine's reverse-sweep DP, across random event streams.
  */
class FinderFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val L = 3

  /** Max level over all chains from start index s (brute force). */
  private def bruteReach(ts: Array[Long], step: Array[Int], s: Int,
                         win: Long): Int = {
    val n = ts.length
    def deepest(prevIdx: Int, nextStep: Int): Int = {
      if (nextStep > L) nextStep - 1
      else {
        var best = nextStep - 1
        var j = 0
        while (j < n) {
          if (j != prevIdx && step(j) == nextStep && ts(j) >= ts(prevIdx) &&
              ts(j) <= ts(s) + win) {
            val d = deepest(j, nextStep + 1)
            if (d > best) best = d
          }
          j += 1
        }
        best
      }
    }
    deepest(s, 2)
  }

  private def bruteLevels(ts: Array[Long], step: Array[Int], watchStart: Long,
                          watchStep: Long, slots: Int, win: Long): Seq[Int] = {
    val levels = new Array[Int](slots)
    for (s <- ts.indices if step(s) == 1) {
      val off = ts(s) - watchStart
      if (off >= 0 && off / watchStep < slots) {
        val slot = (off / watchStep).toInt
        levels(slot) = math.max(levels(slot), bruteReach(ts, step, s, win))
      }
    }
    levels.toSeq
  }

  private def engineLevels(rows: Seq[(Long, Int)], watchStart: Long,
                           watchStep: Long, slots: Int, win: Long): Seq[Int] = {
    val ff = FinderFunnelAgg.finderFunnel(watchStart, watchStep, slots, win, L) _
    rows.toDF("us", "step")
      .agg(ff(col("us"), col("step")).as("levels"))
      .as[Seq[Int]].head()
  }

  test("hand cases: slot credit, window cutoff, cross-slot completion") {
    // Chain starts day 0, completes day 1 within window: slot 0 level 3.
    assert(engineLevels(Seq((10L, 1), (95L, 2), (105L, 3)),
      0L, 100L, 3, 100L) === Seq(3, 0, 0))
    // Completion outside window: level stops at the step inside.
    assert(engineLevels(Seq((10L, 1), (95L, 2), (150L, 3)),
      0L, 100L, 3, 100L) === Seq(2, 0, 0))
    // Same-timestamp chain counts (non-decreasing semantics).
    assert(engineLevels(Seq((10L, 1), (10L, 2), (10L, 3)),
      0L, 100L, 3, 100L) === Seq(3, 0, 0))
    // Two starts in different slots, one shared completion: both credited
    // (the exact semantics the reference's two-candidate loop approximates).
    assert(engineLevels(Seq((10L, 1), (110L, 1), (120L, 2), (130L, 3)),
      0L, 100L, 3, 200L) === Seq(3, 3, 0))
    // Start before the watch grid is ignored; step-2 alone scores nothing.
    assert(engineLevels(Seq((5L, 2), (110L, 2)), 100L, 100L, 2, 100L)
      === Seq(0, 0))
  }

  test("differential: engine vs brute-force chain search on 300 random streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(14)
      val ts = Array.fill(n)(rnd.nextInt(40).toLong)
      val step = Array.fill(n)(1 + rnd.nextInt(L))
      val win = 1 + rnd.nextInt(30).toLong
      val sorted = ts.zip(step).sortBy(_._1)
      val (sts, sstep) = (sorted.map(_._1), sorted.map(_._2))
      val expect = bruteLevels(sts, sstep, 0L, 10L, 4, win)
      val got = engineLevels(sorted.toSeq, 0L, 10L, 4, win)
      assert(got === expect,
        s"events=${sorted.mkString(",")} win=$win expect=$expect got=$got")
    }
  }

  test("partial-buffer merge across partitions matches single-partition run") {
    val rows = (1 to 200).map(i => ((i * 7 % 97).toLong, 1 + i % L))
    val one = engineLevels(rows, 0L, 20L, 5, 25L)
    val ff = FinderFunnelAgg.finderFunnel(0L, 20L, 5, 25L, L) _
    val many = rows.toDF("us", "step").repartition(8)
      .agg(ff(col("us"), col("step")).as("levels")).as[Seq[Int]].head()
    assert(many === one)
  }
}
