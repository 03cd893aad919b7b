package graft.operators

import graft.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical-association statistics (reference
  * /root/reference/src/AggregateFunctions/CrossTab.h — the shared
  * cross-tabulation state behind cramersV / cramersVBiasCorrected /
  * theilsU / contingency (AggregateFunctionCramersV.cpp:21,
  * AggregateFunctionCramersVBiasCorrected.cpp:21,
  * AggregateFunctionTheilsU.cpp:21,
  * AggregateFunctionContingencyCoefficient.cpp:21) — and the per-category
  * information value in
  * AggregateFunctionCategoricalInformationValue.h:123).
  *
  * The reference keeps three hash maps (count_a, count_b, count_ab) in
  * one aggregate buffer. The Spark-first shape is relational: one
  * groupBy(a,b).count() shuffle produces the contingency cells — the only
  * pass over the fact table — and every marginal / statistic derives from
  * that tiny cells table (|cells| = distinct pairs, independent of row
  * count). Marginals are window sums over the cells; the χ² reduction is
  * a decimal-quantized aggregate per the repo's Num convention so the
  * result is bit-stable across partitionings, which the double-summing
  * reference is not.
  */
object Association {

  /** All four cross-tab statistics in one pass, exactly the reference's
    * formulas:
    *   φ² = (1/n) Σ_cells (n_ab − n_a·n_b/n)² / (n_a·n_b/n)
    *   cramersV        = sqrt(φ² / (min(|A|,|B|) − 1))
    *   cramersVBiasCorrected: φ²' = max(0, φ² − (|A|−1)(|B|−1)/(n−1)),
    *     k' = min(|A| − (|A|−1)²/(n−1), |B| − (|B|−1)²/(n−1));
    *     V' = sqrt(φ²' / (k' − 1))
    *   theilsU(a,b)    = (Σ_cells p_ab·ln(n_ab/n_b) − h_a) / h_a,
    *     h_a = Σ_a p_a·ln p_a   (U(a|b): how well b predicts a)
    *   contingency     = sqrt(φ² / (φ² + n))   (the reference divides by
    *     n, not the classical φ²+1 — parity with CrossTab.h kept)
    *
    * Returns one row: n, card_a, card_b, phi2, cramers_v,
    * cramers_v_bc, theils_u, contingency. Per-cell LN/χ² terms are summed
    * through DECIMAL(28,12) ([[graft.Num.dsum12]]) — 6-decimal
    * intermediates proved knife-edge-sensitive (a term within an ulp of a
    * rounding boundary flips across engines) — and only the FINAL
    * statistics are quantized through DECIMAL(18,6) and cast back to
    * DOUBLE ([[graft.Num.dq]]):
    * the decimal round-trip makes both engines derive bit-identical
    * doubles from the same exact decimal, while a raw decimal output
    * column is NOT hash-stable across engines (representation differs
    * even when every value is equal).
    */
  def crossTabStats(df: DataFrame, a: Column, b: Column): DataFrame = {
    import Num._
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(a.as("__a"), b.as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__nab"))
    // Marginals via windows over the cells table (no second scan of the
    // input): n_a per __a, n_b per __b, n and cardinalities global.
    val wA = Window.partitionBy(col("__a"))
    val wB = Window.partitionBy(col("__b"))
    val wAll = Window.partitionBy()
    val enriched = cells
      .withColumn("__na", sum(col("__nab")).over(wA))
      .withColumn("__nb", sum(col("__nab")).over(wB))
      .withColumn("__n", sum(col("__nab")).over(wAll))
      .withColumn("__ka", size(collect_set(col("__a")).over(wAll)).cast("long"))
      .withColumn("__kb", size(collect_set(col("__b")).over(wAll)).cast("long"))
    val nD = col("__n").cast("double")
    val expected = col("__na").cast("double") * col("__nb") / nD
    val chiElem = (col("__nab") - expected) * (col("__nab") - expected) / expected
    // p_ab·ln(n_ab/n_b) per cell; h_a needs one element per DISTINCT __a,
    // so the entropy term is masked to the first cell of each __a group
    // (row_number over a deterministic order).
    val rnA = row_number().over(wA.orderBy(col("__b")))
    val hElem = when(col("__rn_a") === 1,
      col("__na").cast("double") / nD * log(col("__na").cast("double") / nD))
      .otherwise(0.0)
    val depElem = col("__nab").cast("double") / nD *
      log(col("__nab").cast("double") / col("__nb"))
    val sums = enriched
      .withColumn("__rn_a", rnA)
      .agg(
        max(col("__n")).as("n"),
        max(col("__ka")).as("card_a"),
        max(col("__kb")).as("card_b"),
        dsum12(chiElem).as("__chi2"),
        dsum12(hElem).as("__ha"),
        dsum12(depElem).as("__dep"))
    val n = col("n").cast("double")
    val phi2 = col("__chi2") / n
    val aAdj = (col("card_a") - 1).cast("double")
    val bAdj = (col("card_b") - 1).cast("double")
    val nAdj = (col("n") - 1).cast("double")
    val phi2Corr = greatest(lit(0.0), phi2 - aAdj * bAdj / nAdj)
    val corrA = col("card_a").cast("double") - aAdj * aAdj / nAdj
    val corrB = col("card_b").cast("double") - bAdj * bAdj / nAdj
    // The five statistics ship as fixed-format 4-decimal STRINGS, not
    // doubles: the values are engine-identical after the decimal
    // quantization, but a double's byte representation is not
    // hash-stable across engines/builds, and even at 6 decimals the
    // per-cell ln() terms land on a 1e-6 knife edge between libm
    // builds. Printing at 4 decimals closes both channels; the
    // statistics stay meaningful at this precision.
    def d6(c: Column): Column = format_string("%.4f", Num.dq(c, 4))
    sums.select(
      col("n"), col("card_a"), col("card_b"),
      d6(phi2).as("phi2"),
      d6(sqrt(phi2 / (least(col("card_a"), col("card_b")) - 1)))
        .as("cramers_v"),
      d6(sqrt(phi2Corr / (least(corrA, corrB) - 1))).as("cramers_v_bc"),
      d6((col("__dep") - col("__ha")) / col("__ha")).as("theils_u"),
      d6(sqrt(phi2 / (phi2 + n))).as("contingency"))
  }

  /** Per-category information value
    * (AggregateFunctionCategoricalInformationValue.h:147): for category
    * indicator c and binary tag,
    *   iv(c) = (no_c/Σno − yes_c/Σyes) · (ln(no_c/Σno) − ln(yes_c/Σyes))
    * where no_c / yes_c count rows with c=1 split by tag, and Σno / Σyes
    * are the tag totals over ALL rows (the reference accumulates the tag
    * histogram independently of the categories). One aggregate, one row,
    * one column per category — fixed arity like the reference's N-ary
    * signature.
    */
  def categoricalIV(df: DataFrame, cats: Seq[(String, Column)], tag: Column): DataFrame = {
    val flagged = df.select(
      (cats.map { case (n2, c) => c.cast("boolean").as(s"__c_$n2") } :+
        tag.cast("boolean").as("__tag")): _*)
    val aggs =
      cats.flatMap { case (n2, _) =>
        Seq(
          sum(when(col(s"__c_$n2") && !col("__tag"), 1L).otherwise(0L)).as(s"__no_$n2"),
          sum(when(col(s"__c_$n2") && col("__tag"), 1L).otherwise(0L)).as(s"__yes_$n2"))
      } ++ Seq(
        sum(when(!col("__tag"), 1L).otherwise(0L)).as("__sum_no"),
        sum(when(col("__tag"), 1L).otherwise(0L)).as("__sum_yes"))
    val summed = flagged.agg(aggs.head, aggs.tail: _*)
    val ivCols = cats.map { case (n2, _) =>
      val pNo = col(s"__no_$n2").cast("double") / col("__sum_no")
      val pYes = col(s"__yes_$n2").cast("double") / col("__sum_yes")
      round((pNo - pYes) * (log(pNo) - log(pYes)), 6).as(s"iv_$n2")
    }
    summed.select(ivCols: _*)
  }
}
