package graft.operators

import graft.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical-test aggregates (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionMannWhitney.cpp,
  * AggregateFunctionTTest.h with StudentTTestData/WelchTTestData, and the
  * rank-based ROC AUC in AggregateFunctionRankCorrelation.h's family):
  * two-sample location tests and ranking quality, rebuilt as declarative
  * aggregation plans instead of custom aggregate buffers.
  *
  * Scale shape: the t-tests are one pass of decimal-quantized moment sums
  * (count/Σx/Σx² per sample — map-side combined, deterministic per the
  * repo's Num convention); the rank tests are one global sort-by-value
  * window for ranks plus one aggregate. All arithmetic after the sums is
  * scalar per group, so the statistics are bit-reproducible across
  * partitionings — the reason the buffers quantize instead of summing raw
  * doubles.
  */
object StatTests {

  /** Per-sample moment sums: isA marks membership of sample A; rows are
    * split into A/B by the flag. Returns one row: n_a, n_b, mean_a,
    * mean_b, var_a, var_b (unbiased sample variances).
    */
  private def moments(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    import Num._
    val v6 = valueCol.cast(D6).cast("double")
    df.select(isA.as("__a"), v6.as("__v"))
      .filter(col("__v").isNotNull) // null observations are not samples
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
        dsum6(when(col("__a"), col("__v")).otherwise(0.0)).as("sx_a"),
        dsum6(when(!col("__a"), col("__v")).otherwise(0.0)).as("sx_b"),
        dsum6(when(col("__a"), col("__v") * col("__v")).otherwise(0.0)).as("sxx_a"),
        dsum6(when(!col("__a"), col("__v") * col("__v")).otherwise(0.0)).as("sxx_b"))
      .withColumn("mean_a", col("sx_a") / col("n_a"))
      .withColumn("mean_b", col("sx_b") / col("n_b"))
      .withColumn("var_a",
        (col("sxx_a") - col("sx_a") * col("sx_a") / col("n_a")) / (col("n_a") - 1))
      .withColumn("var_b",
        (col("sxx_b") - col("sx_b") * col("sx_b") / col("n_b")) / (col("n_b") - 1))
  }

  /** Welch's unequal-variances t-test: (t, df) via Welch–Satterthwaite. */
  def welchTTest(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    val se2a = col("var_a") / col("n_a")
    val se2b = col("var_b") / col("n_b")
    moments(df, valueCol, isA)
      .withColumn("t", (col("mean_a") - col("mean_b")) / sqrt(se2a + se2b))
      // Explicit x*x instead of pow(): libm pow need not be correctly
      // rounded, and the oracle engine must reproduce these bits.
      .withColumn("df",
        (se2a + se2b) * (se2a + se2b) /
          (se2a * se2a / (col("n_a") - 1) + se2b * se2b / (col("n_b") - 1)))
      .select(col("n_a"), col("n_b"), round(col("t"), 6).as("t"), round(col("df"), 6).as("df"))
  }

  /** Student's pooled-variance t-test (equal variances assumed). */
  def studentTTest(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    val sp2 = ((col("n_a") - 1) * col("var_a") + (col("n_b") - 1) * col("var_b")) /
      (col("n_a") + col("n_b") - 2)
    moments(df, valueCol, isA)
      .withColumn("t", (col("mean_a") - col("mean_b")) /
        sqrt(sp2 * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .select(col("n_a"), col("n_b"), round(col("t"), 6).as("t"))
  }

  /** Per-distinct-value mid-rank sums for sample A. Ranks come from the
    * value histogram, not from ranking raw rows: groupBy(value) combines
    * map-side so the shuffle carries one row per distinct value, and the
    * cumulative window sorts only distinct values (the [[Quantiles]]
    * shape). Mid-ranks are carried doubled — 2·avgRank = 2·cumBefore +
    * ties + 1, an exact integer — so the rank sum is order-independent
    * long arithmetic. Returns (n_a, n_b, r2_a = 2·R_A).
    */
  private def rankSums(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df.select(isA.as("__a"), valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    cnt
      .withColumn("__b", coalesce(sum(col("__c")).over(wCum), lit(0L)))
      .agg(
        sum(col("__ca")).as("n_a"),
        sum(col("__c") - col("__ca")).as("n_b"),
        sum(col("__ca") * (lit(2) * col("__b") + col("__c") + 1)).as("r2_a"))
  }

  /** Mann–Whitney U (normal approximation, mid-ranks for ties). The
    * n(n+1)/2 and n_a·n_b products go through double BEFORE multiplying —
    * in long arithmetic they overflow past ~3e9 rows per sample.
    */
  def mannWhitneyU(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    val u = col("r2_a").cast("double") / 2 -
      col("n_a").cast("double") * (col("n_a") + 1) / 2
    val mu = col("n_a").cast("double") * col("n_b") / 2.0
    val sigma = sqrt(col("n_a").cast("double") * col("n_b") *
      (col("n_a") + col("n_b") + 1) / 12.0)
    rankSums(df, valueCol, isA).select(col("n_a"), col("n_b"),
      round(u, 6).as("u"), round((u - mu) / sigma, 6).as("z"))
  }

  /** Two-sample mean z-test with KNOWN population variances (reference
    * AggregateFunctionMeanZTest.h:41 — pop_var_x / pop_var_y are
    * parameters, not estimated): z = (x̄_a − x̄_b) / √(σ²_a/n_a + σ²_b/n_b).
    * Statistic only, matching the repo's t-test outputs.
    */
  def meanZTest(df: DataFrame, valueCol: Column, isA: Column,
      popVarA: Double, popVarB: Double): DataFrame = {
    moments(df, valueCol, isA)
      .withColumn("z", (col("mean_a") - col("mean_b")) /
        sqrt(lit(popVarA) / col("n_a") + lit(popVarB) / col("n_b")))
      .select(col("n_a"), col("n_b"), round(col("z"), 6).as("z"))
  }

  /** ROC AUC of `score` ranking `label` (true = positive): the rank-sum
    * identity AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with
    * mid-ranks, so ties contribute 1/2 — matching the trapezoidal curve.
    */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val u = col("r2_a").cast("double") / 2 -
      col("n_a").cast("double") * (col("n_a") + 1) / 2
    rankSums(df, scoreCol, labelCol)
      .select(col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        round(u / (col("n_a").cast("double") * col("n_b")), 6).as("auc"))
  }
}
