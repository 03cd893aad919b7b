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

  /** Two-phase distributed selection for high-cardinality numeric
    * columns: pass 1 aggregates counts per (group, coarse bucket) — the
    * shuffle carries O(groups × buckets) rows regardless of data size —
    * locates the bucket holding each target rank, then pass 2 re-scans
    * only the rows of those candidate buckets (≈ n/buckets rows) to
    * resolve the exact rank values. No full sort of the column anywhere;
    * this is how exact percentiles stay feasible when a group holds
    * billions of rows. Only the tiny per-(group, spec) rank metadata ever
    * reaches the driver.
    *
    * Same QUANTILE_CONT interpolation contract as [[percentiles]].
    */
  def percentilesSelect(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bucketWidth: Double,
      specs: Seq[(Double, String)]): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row

    // Pass 1: coarse histogram (NULLs ignored, matching QUANTILE_CONT).
    val nn = df.filter(col(valueCol).isNotNull)
    val cnt = nn.groupBy(col(groupCol).as("__g"),
        floor(col(valueCol) / lit(bucketWidth)).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val wB = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("__g"))
    val marked = cnt
      .withColumn("__before", coalesce(sum(col("__c")).over(wB), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .collect() // O(groups × buckets) metadata rows only

    // Locate, per (group, spec), the buckets and in-bucket indices of the
    // floor/ceil target ranks.
    final case class Need(g: Any, bucket: Long, localIdx: Long, spec: Int, isUpper: Boolean)
    val byGroup = marked.groupBy(_.getAs[Any]("__g"))
    val needs = byGroup.toSeq.flatMap { case (g, rows) =>
      val n = rows.head.getAs[Long]("__n")
      specs.zipWithIndex.flatMap { case ((p, _), si) =>
        val h = (n - 1) * p
        Seq((math.floor(h).toLong, false), (math.ceil(h).toLong, true)).map {
          case (rank, upper) =>
            val row = rows.find(r => r.getAs[Long]("__before") <= rank &&
              rank < r.getAs[Long]("__before") + r.getAs[Long]("__c")).get
            Need(g, row.getAs[Long]("__b"), rank - row.getAs[Long]("__before"), si, upper)
        }
      }
    }
    val nByGroup = byGroup.map { case (g, rows) => g -> rows.head.getAs[Long]("__n") }

    // Pass 2: resolve exact values inside the candidate buckets only.
    val needDf = spark.createDataFrame(
      spark.sparkContext.parallelize(needs.map(nd => Row(nd.g, nd.bucket)).distinct, 1),
      new org.apache.spark.sql.types.StructType()
        .add("__ng", df.schema(groupCol).dataType)
        .add("__nb", org.apache.spark.sql.types.LongType))
    val candidates = nn
      .withColumn("__b", floor(col(valueCol) / lit(bucketWidth)))
      .join(broadcast(needDf),
        col(groupCol) === col("__ng") && col("__b") === col("__nb"))
      .groupBy(col(groupCol).as("__g"), col("__b"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wV = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val resolved = candidates
      .withColumn("__before", coalesce(sum(col("__c")).over(wV), lit(0L)))
      .collect() // O(candidate distinct values) — ≈ rows/buckets
      .groupBy(r => (r.getAs[Any]("__g"), r.getAs[Long]("__b")))

    def valueAt(g: Any, bucket: Long, idx: Long): Double = {
      val rows = resolved((g, bucket))
      val r = rows.find(r => r.getAs[Long]("__before") <= idx &&
        idx < r.getAs[Long]("__before") + r.getAs[Long]("__c")).get
      r.getAs[Number]("__v").doubleValue()
    }

    val out = byGroup.keys.toSeq.map { g =>
      val n = nByGroup(g)
      val vals = specs.zipWithIndex.map { case ((p, _), si) =>
        val h = (n - 1) * p
        val fl = math.floor(h)
        val ce = math.ceil(h)
        val lower = valueAt(g, needs.find(nd => nd.g == g && nd.spec == si && !nd.isUpper).get.bucket,
          needs.find(nd => nd.g == g && nd.spec == si && !nd.isUpper).get.localIdx)
        if (fl == ce) lower
        else {
          val upNd = needs.find(nd => nd.g == g && nd.spec == si && nd.isUpper).get
          val upper = valueAt(g, upNd.bucket, upNd.localIdx)
          lower * (ce - h) + upper * (h - fl)
        }
      }
      Row.fromSeq(g +: vals)
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add(groupCol, df.schema(groupCol).dataType)
    val full = specs.foldLeft(schema) { case (sc, (_, name)) =>
      sc.add(name, org.apache.spark.sql.types.DoubleType)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), full)
  }
}
