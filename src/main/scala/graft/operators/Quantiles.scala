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
    // NULLs are ignored, matching percentile/QUANTILE_CONT.
    val cnt = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__v"))
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

  /** quantileExactWeighted (reference
    * AggregateFunctionQuantileExactWeighted.cpp): per spec p, the smallest
    * value whose cumulative weight reaches p × total weight — a selection,
    * no interpolation. Same distributed histogram shape as [[percentiles]]
    * with weights summed instead of rows counted.
    */
  def percentilesExactWeighted(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      specs: Seq[(Double, String)]): DataFrame = {
    // The reference rejects non-integer weights at analysis time
    // (quantileExactWeighted takes UInt weights); a silent long-cast here
    // would truncate 0.9 → 0 and drop the observation. Integral columns
    // cast directly; floating/decimal columns (common for parquet-typed
    // integer data) carry a codegen'd per-row assert that truncation
    // loses nothing, so a fractional weight fails loudly at runtime.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, NumericType}
    val wLong = df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(weightCol).cast("long")
      case _: NumericType =>
        when(assert_true(col(weightCol) === floor(col(weightCol)),
            lit(s"percentilesExactWeighted: fractional weight in '$weightCol' " +
              "(the reference accepts unsigned-integer weights only)")).isNull,
          col(weightCol).cast("long"))
      case other => throw new IllegalArgumentException(
        s"percentilesExactWeighted: weight column '$weightCol' must be numeric, got $other")
    }
    val cnt = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(sum(wLong).as("__w"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupCol))
    val marked = cnt
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__n", sum(col("__w")).over(wAll))
    val aggs = specs.map { case (p, name) =>
      min(when(col("__cum") >= lit(p) * col("__n"), col("__v"))).as(name)
    }
    marked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** quantileExactLow / quantileExactHigh (reference QuantileExact.h:253 —
    * selection at a rank, no interpolation: level 0.5 picks the low/high
    * median; any other level picks index trunc(level·n), capped at n-1;
    * the trunc happens on the IEEE double product exactly as in the
    * reference, so boundary cases agree bit-for-bit). Same distributed
    * histogram shape as [[percentiles]] — no per-group value buffer.
    */
  def percentilesExactRank(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      specs: Seq[(Double, String)],
      high: Boolean): DataFrame = {
    val cnt = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupCol))
    val marked = cnt
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lo", col("__cum") - col("__c"))
    val n = col("__n")
    def rankOf(p: Double) =
      if (p == 0.5) {
        if (high) floor(n / 2).cast("long")
        else when(n % 2 === 1, floor(n / 2)).otherwise(n / 2 - 1).cast("long")
      } else least(floor(lit(p) * n), n - 1).cast("long")
    val aggs = specs.map { case (p, name) =>
      val r = rankOf(p)
      max(when(col("__lo") <= r && r < col("__cum"), col("__v"))).as(name)
    }
    marked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Two-phase distributed selection for high-cardinality numeric
    * columns: pass 1 aggregates counts per (group, coarse bucket) — the
    * shuffle carries O(groups × buckets) rows regardless of data size —
    * locates the bucket holding each target rank, then pass 2 re-scans
    * only the rows of those candidate buckets (≈ n/buckets rows) to
    * resolve the exact rank values. No full sort of the column anywhere;
    * this is how exact percentiles stay feasible when a group holds
    * billions of rows. Nothing ever reaches the driver: the needs table
    * (which bucket + in-bucket index each target rank lives at) is itself
    * derived distributively from the bucket histogram, so group
    * cardinality is unbounded too — millions of groups × hundreds of
    * buckets stays a (groups × buckets)-row shuffle on executors.
    *
    * Same QUANTILE_CONT interpolation contract as [[percentiles]].
    */
  def percentilesSelect(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bucketWidth: Double,
      specs: Seq[(Double, String)]): DataFrame = {
    import org.apache.spark.sql.types.DoubleType

    // Pass 1: coarse histogram (NULLs ignored, matching QUANTILE_CONT).
    val nn = df.filter(col(valueCol).isNotNull)
    val cnt = nn.groupBy(col(groupCol).as("__g"),
        floor(col(valueCol) / lit(bucketWidth)).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val wB = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("__g"))
    // r15 (guide §2.4): the per-group row count __n is the sum of the
    // group's histogram counts — a window over the (groups × buckets)-row
    // histogram, NOT a second scan of the base table (the old nPerGroup
    // groupBy re-read every base row just to count it).
    val marked = cnt
      .withColumn("__before", coalesce(sum(col("__c")).over(wB), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))

    // Needs derivation — distributed, and join-free (r15): every
    // histogram row already knows its group's total __n and its own
    // cumulative range [__before, __before + __c), so the (spec, side)
    // targets whose global rank lands inside this bucket are a per-row
    // FILTER over the 2×|specs|-element literal spec array. The old shape
    // joined a separate rank table against the histogram, which
    // recomputed the whole upstream (histogram scan + count scan) once
    // per downstream use — 4 extra base-table scans in the executed plan.
    // O(groups × specs) need rows, never collected.
    val specArr = array(specs.zipWithIndex.flatMap { case ((p, _), i) =>
      Seq(false, true).map(upper =>
        struct(lit(i).as("__nspec"), lit(p).as("__p"), lit(upper).as("__nupper")))
    }: _*)
    def rankOf(sp: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) = {
      val h = (n - 1).cast(DoubleType) * sp.getField("__p")
      when(sp.getField("__nupper"), ceil(h)).otherwise(floor(h)).cast("long")
    }
    val needDf = marked
      .select(col("__g"), col("__b"), col("__before"), col("__c"), col("__n"),
        explode(filter(specArr, sp => {
          val r = rankOf(sp, col("__n"))
          col("__before") <= r && r < col("__before") + col("__c")
        })).as("__sp"))
      .select(col("__g").as("__ng"), col("__b").as("__nb"),
        (rankOf(col("__sp"), col("__n")) - col("__before")).as("__nidx"),
        col("__sp.__nspec").as("__nspec"), col("__sp.__nupper").as("__nupper"),
        col("__n"))

    // Pass 2: candidate-bucket rows are re-counted per distinct value,
    // ranked by an in-bucket cumulative window, and the needed rank is
    // picked from the same stream. r15: ONE join against the needs table
    // (it was two — a distinct-buckets semi-join before the groupBy plus
    // a rank-pick join after — and the doubly-used needs subtree was
    // recomputed from the base table each time). A bucket holding several
    // needs duplicates its rows per need (≤ 2×|specs|×); each need then
    // ranks its own duplicate stream, keyed into the groupBy/window by
    // (spec, side). AQE broadcasts the tiny needs side. A pathologically
    // hot bucket costs one window over its distinct values on executors,
    // never a driver OOM.
    val candCounts = nn
      .withColumn("__b", floor(col(valueCol) / lit(bucketWidth)))
      .join(needDf,
        col(groupCol) === col("__ng") && col("__b") === col("__nb"))
      .groupBy(col("__ng").as("__g"), col("__nb"), col("__nspec"),
        col("__nupper"), col("__nidx"), col("__n"),
        col(valueCol).cast(DoubleType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wV = Window.partitionBy(col("__g"), col("__nb"), col("__nspec"),
        col("__nupper")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val picked = candCounts
      .withColumn("__before", coalesce(sum(col("__c")).over(wV), lit(0L)))
      .filter(col("__before") <= col("__nidx") &&
        col("__nidx") < col("__before") + col("__c"))
      .select(col("__g"), col("__nspec"), col("__nupper"), col("__v"), col("__n"))

    // Both floor and ceil needs always exist, so __lo/__hi are never null.
    val pCol = specs.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, ((p, _), i)) => when(col("__nspec") === i, lit(p)).otherwise(acc)
    }
    val h = (col("__n") - 1).cast(DoubleType) * pCol
    val interp = picked
      .groupBy(col("__g"), col("__nspec"))
      .agg(max(when(!col("__nupper"), col("__v"))).as("__lo"),
        max(when(col("__nupper"), col("__v"))).as("__hi"),
        max(col("__n")).as("__n"))
      .withColumn("__val",
        when(floor(h) === ceil(h), col("__lo"))
          .otherwise(col("__lo") * (ceil(h) - h) + col("__hi") * (h - floor(h))))
    val outCols = specs.zipWithIndex.map { case ((_, name), i) =>
      max(when(col("__nspec") === i, col("__val"))).as(name)
    }
    interp.groupBy(col("__g").as(groupCol)).agg(outCols.head, outCols.tail: _*)
  }
}
