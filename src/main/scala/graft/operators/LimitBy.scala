package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LIMIT n BY cols (reference LimitByStep —
  * /root/reference/src/QueryPlan/LimitByStep.h:23,
  * /root/reference/src/Processors/Transforms/LimitByTransform.cpp): keep
  * the first `n` rows per distinct key, in the given order — the daily
  * ClickHouse idiom for "top-n per group" without a join.
  *
  * Spark-first shape: a row_number window that Catalyst collapses into
  * WindowGroupLimit, so each shuffle partition keeps only n rows per key
  * before any exchange — no full per-group sort materializes. The order
  * columns should include a unique tiebreaker for deterministic output.
  */
object LimitBy {
  def limitBy(df: DataFrame, n: Int, by: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__lb_rn",
        row_number().over(Window.partitionBy(by: _*).orderBy(order: _*)))
      .filter(col("__lb_rn") <= n)
      .drop("__lb_rn")
}
