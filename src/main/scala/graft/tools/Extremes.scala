package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Extremes (reference: the `extremes = 1` setting appends two rows —
  * per-numeric-column minimums and maximums — to any result set,
  * /root/reference/src/QueryPipeline/QueryPipelineBuilder + the
  * Extremes transform in src/Processors/Transforms/ExtremesTransform.cpp).
  *
  * SURVEY §2.6 had adjudicated this a protocol nicety; it is cheap to
  * carry honestly: one aggregate over the (already computed) result
  * frame produces the two decoration rows — numeric columns carry
  * min/max, non-numeric columns are null, and a `__row_kind` column
  * distinguishes result/min/max (the reference separates them in the
  * wire protocol's extremes block; a column is the DataFrame-shaped
  * equivalent).
  */
object Extremes {

  /** The result frame with the two extremes rows appended. */
  def withExtremes(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name).toSet
    def decoration(kind: String, agg: String => org.apache.spark.sql.Column) =
      df.agg(
        df.schema.fields.map { f =>
          (if (numeric(f.name)) agg(f.name)
           else lit(null).cast(f.dataType)).as(f.name)
        }.head,
        df.schema.fields.map { f =>
          (if (numeric(f.name)) agg(f.name)
           else lit(null).cast(f.dataType)).as(f.name)
        }.tail: _*)
        .withColumn("__row_kind", lit(kind))
    df.withColumn("__row_kind", lit("result"))
      .unionByName(decoration("min", c => min(col(c))))
      .unionByName(decoration("max", c => max(col(c))))
  }
}
