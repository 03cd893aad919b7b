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
    val marked = cnt
      .withColumn("__before", coalesce(sum(col("__c")).over(wB), lit(0L)))

    // Needs derivation — distributed. Per-group row counts (a cheap
    // column-pruned count, no window) explode against a 2×|specs|-element
    // literal array (spec index, p, floor/ceil side), yielding one target
    // rank per (group, spec, side); an equi-join on group with a range
    // residual against the histogram locates the bucket covering each
    // rank. O(groups × specs) rows, never collected; the generator-based
    // fan-out keeps the repo-wide no-cartesian plan sweep strict, and
    // __n rides along into the needs table so no later join re-derives it.
    val specArr = array(specs.zipWithIndex.flatMap { case ((p, _), i) =>
      Seq(false, true).map(upper =>
        struct(lit(i).as("__nspec"), lit(p).as("__p"), lit(upper).as("__nupper")))
    }: _*)
    val nPerGroup = nn.groupBy(col(groupCol).as("__gn"))
      .agg(count(lit(1)).as("__n"))
    val ranks = nPerGroup
      .select(col("__gn"), col("__n"), explode(specArr).as("__sp"))
      .select(col("__gn"), col("__n"), col("__sp.__nspec").as("__nspec"),
        col("__sp.__p").as("__p"), col("__sp.__nupper").as("__nupper"))
      .withColumn("__h", (col("__n") - 1).cast(DoubleType) * col("__p"))
      .withColumn("__rank",
        when(col("__nupper"), ceil(col("__h"))).otherwise(floor(col("__h"))).cast("long"))
    val needDf = ranks.join(marked,
        col("__gn") === col("__g") &&
          col("__before") <= col("__rank") &&
          col("__rank") < col("__before") + col("__c"))
      .select(col("__g").as("__ng"), col("__b").as("__nb"),
        (col("__rank") - col("__before")).as("__nidx"),
        col("__nspec"), col("__nupper"), col("__n"))
    val bucketsDf = needDf.select(col("__ng"), col("__nb")).distinct()

    // Pass 2: candidate-bucket rows are re-counted per distinct value,
    // ranked by an in-bucket cumulative window, and the needed rank is
    // picked by an equi-join (AQE broadcasts the needs side when it is
    // small; with millions of groups it shuffles — both shapes scale). A
    // pathologically hot bucket costs one window over its distinct values
    // on executors, never a driver OOM.
    val candCounts = nn
      .withColumn("__b", floor(col(valueCol) / lit(bucketWidth)))
      .join(bucketsDf,
        col(groupCol) === col("__ng") && col("__b") === col("__nb"))
      .groupBy(col(groupCol).as("__g"), col("__b"),
        col(valueCol).cast(DoubleType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wV = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val picked = candCounts
      .withColumn("__before", coalesce(sum(col("__c")).over(wV), lit(0L)))
      .join(needDf,
        col("__g") === col("__ng") && col("__b") === col("__nb") &&
          col("__before") <= col("__nidx") &&
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
