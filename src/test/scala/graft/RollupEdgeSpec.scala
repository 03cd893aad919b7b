package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the one semantic edge flagged against the r15 `agg_rollup`
  * rewrite (rollup over pre-aggregated (status, priority) cells instead
  * of raw rows): the r15 verdict suspected the pre-aggregated form
  * drops the grand-total row on an EMPTY input where a direct rollup
  * would keep it. Measured here: Spark's rollup lowers to Expand →
  * grouped aggregate on spark_grouping_id, so BOTH forms emit 0 rows on
  * empty input — the two Spark shapes agree on every input, including
  * the empty one, and the r15 rewrite introduced no divergence. (A SQL
  * engine emitting the standard's grand-total row for `GROUP BY ROLLUP`
  * over an empty table — DuckDB does — differs from Spark on this edge
  * for the DIRECT form too; that is pre-existing Spark semantics, not a
  * property of the rewrite, and no oracle dataset exercises it.) This
  * spec is the tripwire if either half changes.
  */
class RollupEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def preAgg(o: DataFrame): DataFrame = o
    .groupBy(col("st"), col("pr"))
    .agg(count(lit(1)).as("__n"), sum(col("price").cast(Num.D2)).as("__sum"))
    .rollup(col("st"), col("pr"))
    .agg(sum(col("__n")).as("n_orders"),
         sum(col("__sum")).cast("double").as("sum_price"),
         grouping(col("st")).cast("int").as("g_st"),
         grouping(col("pr")).cast("int").as("g_pr"))
    .orderBy(col("st").asc_nulls_first, col("pr").asc_nulls_first)

  private def direct(o: DataFrame): DataFrame = o
    .rollup(col("st"), col("pr"))
    .agg(count(lit(1)).as("n_orders"),
         sum(col("price").cast(Num.D2)).cast("double").as("sum_price"),
         grouping(col("st")).cast("int").as("g_st"),
         grouping(col("pr")).cast("int").as("g_pr"))
    .orderBy(col("st").asc_nulls_first, col("pr").asc_nulls_first)

  test("pre-aggregated rollup matches direct rollup on non-empty input") {
    val o = Seq(("O", "1-URGENT", 10.5), ("O", "2-HIGH", 1.25),
                ("F", "1-URGENT", 3.0), ("O", "1-URGENT", 0.25))
      .toDF("st", "pr", "price")
    val a = preAgg(o).collect().map(_.toSeq)
    val b = direct(o).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 6) // 3 cells + 2 status subtotals + grand total
  }

  test("empty input: both forms agree (0 rows — Spark rollup emits no grand total)") {
    val empty = Seq.empty[(String, String, Double)].toDF("st", "pr", "price")
    assert(preAgg(empty).collect().length === 0)
    assert(direct(empty).collect().length === 0)
  }
}
