package graft

import graft.aggregates.FunnelPathSplitByTimesAgg.funnelPathSplitByTimes
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-traced reference cases for funnelPathSplitByTimes
  * (AggregateFunctionFunnelPathSplitByTimes.h insertResultInto): every
  * step-1 event opens a bucket, level events go to exactly one eligible
  * bucket in creation order, common events replicate to every
  * window-reachable bucket, and depth exhaustion stops level-ups but
  * not appends (the reference's size check runs AFTER the append).
  */
class FunnelPathSplitByTimesSpec extends SparkSpec {
  import spark.implicits._

  private def run(events: Seq[(Long, Int, String)],
      windowUs: Long, depth: Int, levels: Int): Seq[Seq[(Int, String)]] = {
    val f = funnelPathSplitByTimes(windowUs, depth, levels) _
    val df = events.toDF("us", "idx", "param")
      .agg(f(col("us"), col("idx"), col("param")).as("paths"))
    df.collect()(0).getSeq[scala.collection.Seq[Row]](0)
      .map(_.map(r => (r.getInt(0), r.getString(1))).toSeq).toSeq
  }

  test("two interleaved runs: level events pick the oldest eligible bucket") {
    val paths = run(Seq(
      (0L, 1, "a1"), (10L, 0, "c1"), (20L, 2, "b"),
      (30L, 1, "a2"), (40L, 2, "x"), (50L, 3, "p"), (60L, 3, "q")),
      windowUs = 100, depth = 8, levels = 3)
    assert(paths === Seq(
      Seq((1, "a1"), (0, "c1"), (2, "b"), (3, "p")),
      Seq((1, "a2"), (2, "x"), (3, "q"))))
  }

  test("window expiry retires a bucket from level candidacy and appends") {
    val paths = run(Seq(
      (0L, 1, "a"), (10L, 0, "c"), (20L, 2, "d"),
      (25L, 1, "e"), (30L, 2, "f")),
      windowUs = 15, depth = 8, levels = 3)
    assert(paths === Seq(
      Seq((1, "a"), (0, "c")),
      Seq((1, "e"), (2, "f"))))
  }

  test("depth exhaustion stops level-ups but not window-reachable appends") {
    val paths = run(Seq(
      (0L, 1, "a"), (5L, 0, "c"), (10L, 2, "d")),
      windowUs = 100, depth = 2, levels = 3)
    // bucket is depth-retired after 'c'; 'd' finds no level candidate and
    // falls through to a common append — exactly the reference's order of
    // append-then-size-check
    assert(paths === Seq(Seq((1, "a"), (0, "c"), (2, "d"))))
  }

  test("level events before any bucket are dropped; empty input is empty") {
    val paths = run(Seq((0L, 2, "x"), (5L, 1, "a")),
      windowUs = 100, depth = 8, levels = 3)
    assert(paths === Seq(Seq((1, "a"))))
    assert(run(Seq.empty, 100, 8, 3) === Seq.empty)
  }

  test("merge across partitions is order-independent") {
    val events = Seq(
      (0L, 1, "a1"), (10L, 0, "c1"), (20L, 2, "b"),
      (30L, 1, "a2"), (40L, 2, "x"), (50L, 3, "p"), (60L, 3, "q"))
    val f = funnelPathSplitByTimes(100, 8, 3) _
    val shuffled = scala.util.Random.shuffle(events)
    val df = shuffled.toDF("us", "idx", "param").repartition(4)
      .agg(f(col("us"), col("idx"), col("param")).as("paths"))
    val paths = df.collect()(0).getSeq[scala.collection.Seq[Row]](0)
      .map(_.map(r => (r.getInt(0), r.getString(1))).toSeq).toSeq
    assert(paths === Seq(
      Seq((1, "a1"), (0, "c1"), (2, "b"), (3, "p")),
      Seq((1, "a2"), (2, "x"), (3, "q"))))
  }
}
