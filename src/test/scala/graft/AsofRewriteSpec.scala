package graft

import org.apache.spark.sql.functions._

/** The asof_le marker + AsofJoinRewrite rule, exercised through plain SQL
  * on the extensions-enabled shared session.
  */
class AsofRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkViews(): Unit = {
    Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag").createOrReplaceTempView("probe")
    Seq((1L, 8L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0), (3L, 1L, 400.0))
      .toDF("rk", "rt", "v").createOrReplaceTempView("ref")
  }

  test("asof_le SQL join rewrites to union+window with backward semantics") {
    mkViews()
    val rows = spark.sql(
      """SELECT p.k, p.t, p.tag, r.rt, r.v
        |FROM probe p LEFT JOIN ref r ON p.k = r.rk AND asof_le(r.rt, p.t)
        |ORDER BY p.k, p.t""".stripMargin).collect()
    // (1,10): rt=10 matches non-strict <=; (1,25): latest rt=20;
    // (2,5): no key match -> nulls.
    assert(rows.length === 3)
    assert(rows(0).getLong(3) === 10L && rows(0).getDouble(4) === 200.0)
    assert(rows(1).getLong(3) === 20L && rows(1).getDouble(4) === 300.0)
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(4))
    // the Join must be gone from the optimized plan
    val plan = spark.sql(
      """SELECT p.k FROM probe p LEFT JOIN ref r
        |ON p.k = r.rk AND asof_le(r.rt, p.t)""".stripMargin)
      .queryExecution.optimizedPlan
    assert(!plan.toString.toLowerCase.contains("join"))
  }

  test("asof_le inner join drops unmatched left rows") {
    mkViews()
    val rows = spark.sql(
      """SELECT p.k, p.t, r.v
        |FROM probe p JOIN ref r ON p.k = r.rk AND asof_le(r.rt, p.t)
        |ORDER BY p.k, p.t""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 1L)) // k=2 unmatched
    assert(rows.map(_.getDouble(2)).toSeq === Seq(200.0, 300.0))
  }

  test("asof_le SQL matches the operator-form AsofJoin.backward") {
    mkViews()
    val sqlRes = spark.sql(
      """SELECT p.k, p.t, r.v FROM probe p
        |LEFT JOIN ref r ON p.k = r.rk AND asof_le(r.rt, p.t)
        |ORDER BY p.k, p.t""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    val op = operators.AsofJoin.backward(
      spark.table("probe"), spark.table("ref"),
      keyLeft = "k", keyRight = "rk", leftTime = "t", rightTime = "rt",
      rightCols = Seq("v"))
      .orderBy($"k", $"t")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(sqlRes.toSeq === op.toSeq)
  }

  test("backwardSameSource matches backward on a side-tagged single table") {
    // One table carrying both sides, incl. an equal-time (k=1, t=10)
    // left/right pair to pin the non-strict <= tie rule, a left row with
    // no preceding right (k=2), and a right-only key (k=3).
    val ev = Seq(
      (1L, 8L, "r", 100.0, 0L), (1L, 10L, "l", 0.0, 11L),
      (1L, 10L, "r", 200.0, 0L), (1L, 20L, "r", 300.0, 0L),
      (1L, 25L, "l", 0.0, 12L), (2L, 5L, "l", 0.0, 13L),
      (3L, 1L, "r", 400.0, 0L))
      .toDF("k", "t", "side", "v", "lid")
    val fused = operators.AsofJoin.backwardSameSource(ev,
        isLeft = $"side" === "l", isRight = $"side" === "r",
        key = "k", time = "t", leftCols = Seq("lid"), rightCols = Seq("v"))
      .select($"lid", $"k", $"t", $"asof_v")
      .orderBy($"k", $"t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    val twoScan = operators.AsofJoin.backward(
        ev.filter($"side" === "l").select($"lid", $"k", $"t"),
        ev.filter($"side" === "r").select($"k".as("rk"), $"t".as("rt"), $"v"),
        keyLeft = "k", keyRight = "rk", leftTime = "t", rightTime = "rt",
        rightCols = Seq("v"))
      .select($"lid", $"k", $"t", $"asof_v")
      .orderBy($"k", $"t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(fused.toSeq === twoScan.toSeq)
    // the equal-time pair must match non-strictly (200.0, not 100.0)
    assert(fused.find(_._1 == 11L).get._4 === 200.0)
    // no preceding right row -> null
    assert(fused.find(_._1 == 13L).get._4 === null)
  }
}
