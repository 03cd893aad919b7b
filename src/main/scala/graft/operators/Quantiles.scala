package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (QUANTILE_CONT semantics, the
  * reference's quantileExact family —
  * /root/reference/src/AggregateFunctions/AggregateFunctionQuantile.h:66)
  * computed as a distributed value-counts histogram + cumulative-sum
  * window instead of Spark's builtin exact `percentile`, which collects a
  * per-group value→count map inside one ObjectHashAggregate buffer.
  *
  * Scale shape: groupBy (group, value) combines map-side so the shuffle
  * carries one row per distinct (group, value); the window then sorts
  * only distinct values within each group. No executor ever holds a
  * whole group's raw values — this survives groups of any cardinality,
  * where the builtin's single buffer per group does not.
  */
object Quantiles {

  /** One row per `groupCol` with a column per (p, outName) spec.
    * Interpolation replicates Spark/ANSI QUANTILE_CONT exactly:
    * h = (n-1)p; result = v[floor h]*(ceil h - h) + v[ceil h]*(h - floor h).
    */
  def percentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      specs: Seq[(Double, String)]): DataFrame = {
    val cnt = df.groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupCol))
    val marked = cnt
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lo", col("__cum") - col("__c"))
    // Per spec: the sorted 0-based index range [__lo, __cum) covered by
    // each distinct value; pick the values covering floor(h) and ceil(h).
    val picked = specs.zipWithIndex.foldLeft(marked) { case (d, ((p, _), i)) =>
      val h = (col("__n") - 1) * lit(p)
      d.withColumn(s"__fl_$i", floor(h)).withColumn(s"__ce_$i", ceil(h))
    }
    val aggs = specs.zipWithIndex.flatMap { case (_, i) =>
      Seq(
        max(when(col("__lo") <= col(s"__fl_$i") && col(s"__fl_$i") < col("__cum"), col("__v")))
          .as(s"__l_$i"),
        max(when(col("__lo") <= col(s"__ce_$i") && col(s"__ce_$i") < col("__cum"), col("__v")))
          .as(s"__u_$i"))
    } :+ max(col("__n")).as("__n")
    val grouped = picked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outs = specs.zipWithIndex.map { case ((p, name), i) =>
      val h = (col("__n") - 1) * lit(p)
      val fl = floor(h)
      val ce = ceil(h)
      when(fl === ce, col(s"__l_$i"))
        .otherwise(col(s"__l_$i") * (ce - h) + col(s"__u_$i") * (h - fl))
        .as(name)
    }
    grouped.select(col(groupCol) +: outs: _*)
  }
}
