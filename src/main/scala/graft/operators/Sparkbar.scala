package graft.operators

import graft.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sparkbar(width, from_x, to_x)(x, y): unicode bar-chart string per
  * group (reference AggregateFunctionSparkbar.h:140 `render`):
  *
  *   1. collapse input to points x → Σy;
  *   2. bucket index = ⌊width/(to_x−from_x+1) · (x−from_x)⌋ (float
  *      multiply then truncate, capped at width−1 — same arithmetic as
  *      the reference's `w / delta * value` cast);
  *   3. bucket height = mean of its points' sums (histogram[i] /=
  *      fhistogram[i]);
  *   4. level = 0 when height ≤ 0, else trunc(height·7/y_max + 1) ∈ 1..8;
  *   5. glyph per level from " ▁▂▃▄▅▆▇█", concatenated in bucket order
  *      (empty buckets render the space glyph).
  *
  * Relational shape: one groupBy(keys, x) over the input (the only
  * full-data shuffle), then per-bucket aggregation and a window max over
  * the tiny bucket table. Heights are quantized to 6 decimals before the
  * level math so the glyph choice is partition-order-stable (the
  * reference sums raw doubles and is not).
  */
object Sparkbar {

  private val Glyphs = " ▁▂▃▄▅▆▇█"

  def render(df: DataFrame, key: Column, x: Column, y: Column,
      width: Int, fromX: Long, toX: Long): DataFrame = {
    import Num._
    require(width > 0 && toX >= fromX, "sparkbar: need width > 0, to_x >= from_x")
    val delta = (toX - fromX + 1).toDouble
    val points = df
      .filter(x >= fromX && x <= toX)
      .groupBy(key.as("__k"), x.as("__x"))
      .agg(dsum6(y).as("__ysum"))
    val bucketed = points
      .withColumn("__b",
        least(floor(lit(width.toDouble) / delta * (col("__x") - fromX)),
          lit(width - 1)).cast("int"))
      .groupBy(col("__k"), col("__b"))
      .agg(round(dsum6(col("__ysum")) / count(lit(1)), 6).as("__h"))
    val wK = Window.partitionBy(col("__k"))
    val leveled = bucketed
      .withColumn("__ymax", max(when(col("__h") > 0, col("__h"))).over(wK))
      .withColumn("__lvl",
        when(col("__h") <= 0 || col("__ymax").isNull, 0)
          .otherwise(floor(col("__h") * 7 / col("__ymax") + 1).cast("int")))
    leveled
      .groupBy(col("__k"))
      .agg(collect_list(struct(col("__b"), col("__lvl"))).as("__cells"))
      .select(col("__k").as("k"),
        array_join(
          transform(sequence(lit(0), lit(width - 1)), i => {
            val lvl = coalesce(
              element_at(map_from_entries(col("__cells")), i), lit(0))
            lit(Glyphs).substr(lvl + 1, lit(1))
          }), "").as("bar"))
  }
}
