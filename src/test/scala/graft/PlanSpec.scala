package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape conformance (the reference's optimizer golden-plan tests,
  * SURVEY §5.2, recast as assertions on Catalyst physical plans): filters
  * and projections must reach the parquet scan, dimension joins must
  * broadcast, per-group top-N must use WindowGroupLimit — the properties
  * that keep these plans viable at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  /** Plan after execution — AQE has finalized stages, codegen visible. */
  private def finalPlan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // pruned scan: none of the unused columns are read
    assert(!p.contains("l_orderkey"), "scan should not read l_orderkey")
  }

  test("events ts-range predicate pushes into the parquet scan (post-NTZ fix)") {
    // Before the Tables NTZ/nanos normalization moved to a plain column
    // cast, ts predicates wrapped the column in timestamp_micros(ts div
    // 1000) — an expression parquet can't evaluate, so a ts-range filter
    // meant a FULL events scan (fatal at 100 TB). The canonical schema
    // exposes the raw column; the range must now reach PushedFilters.
    val p = plan("bitmap_column_logic")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"), p.take(1500))
  }

  test("q5: dimension joins broadcast (no fact-side shuffle for dims)") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
  }

  test("q6: every predicate is pushed down") {
    val p = plan("q6_forecast_revenue")
    // PushedFilters renders truncated in toString; assert the pushdown list
    // starts with the range filters and the full predicate set survives in
    // the post-scan Filter.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    assert(p.contains(">= 0.02"), "discount lower bound present")
    assert(p.contains("< 24.0"), "quantity bound present")
  }

  test("per-group top-N uses WindowGroupLimit (partition top-N pushdown)") {
    val p = plan("win_topn_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("knn probe side broadcasts; corpus is not shuffled") {
    val p = plan("knn_bruteforce_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("trivial count answers from parquet metadata (aggregate pushdown)") {
    // needs the DSv2 parquet scan: v1 has no aggregate pushdown
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val p = plan("trivial_count")
      assert(p.contains("PushedAggregation: [COUNT(*)]"), p.take(2000))
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.unset("spark.sql.sources.useV1SourceList")
    }
  }

  test("q8: all five dimension inputs broadcast, fact side never re-shuffles for them") {
    val p = plan("q8_market_share")
    val broadcasts = "BroadcastExchange".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast exchanges, got $broadcasts\n" + p.take(2000))
  }

  test("agg_histogram: per-type stats join broadcasts (two-pass, no fact self-shuffle)") {
    val p = plan("agg_histogram")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("whole-stage codegen covers the scan->agg hot path of q1") {
    val p = finalPlan("q1_pricing_summary")
    // codegen'd operators render as "*(n) Op" in the finalized plan
    assert(p.contains("*(1)") && p.contains("HashAggregate"), p.take(1000))
  }

  test("limit_by collapses to WindowGroupLimit (per-partition top-n before exchange)") {
    val p = plan("limit_by")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("dict_lookup: both dictionary joins broadcast, fact side never shuffles for them") {
    val p = finalPlan("dict_lookup")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("stat tests aggregate via partial (map-side) combine, no raw-row exchange") {
    // The moment sums must partial-aggregate before the exchange: exactly
    // one pair of HashAggregates around a single shuffle of 6 sums.
    val p = finalPlan("stat_welch_ttest")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ssb q4.1: all three denormalized dims broadcast; fact never shuffles for a dim") {
    // The widest SSB star: cust_d/supp_d/part_d (and their nation/region
    // snowflake arms) must all hash-broadcast onto the fact side. The
    // only shuffle allowed is lineitem⋈orders (fact-key join) + the
    // final group-by exchange.
    val p = finalPlan("ssb_q4_1")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ssb q1.1: flight-1 predicates push into the fact scan, no dim join") {
    val p = plan("ssb_q1_1")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(!p.contains("c_custkey"), "flight 1 must not touch a dimension")
  }
}
