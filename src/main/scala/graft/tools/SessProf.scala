package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: alternating prepared-plan A/B of session_analysis_tuples
  * formulations (bench measurement model: plan once, consume the cached
  * QueryExecution RDD per rep, clearCache between reps). Host drift hits
  * both sides equally; planning cost is excluded, exactly like Bench.
  */
object SessProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())

    val gapUs = 1800L * 1000000
    def base = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts").as("__ts"), col("event_type").as("__ev"))
      .withColumn("__us", Tables.tsUs(col("__ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"), col("__ev"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__us"), 1).over(w)
    val nxt = lead(col("__us"), 1).over(w)

    // A: r15 shape — lag + running-sum sid, groupBy (falls to SortAggregate)
    def sessOld: DataFrame = base
      .withColumn("__brk",
        when(prev.isNull || col("__us") - prev >= gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__brk")).over(wRun))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("__ts")).as("session_time"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        count(lit(1)).as("depth"),
        max_by(col("__ev"), struct(col("__us"), col("__ev"))).as("end_event"))
      .select(col("user_id"), col("session_time"), col("duration_us"),
        col("depth"), col("end_event"))
      .orderBy(col("user_id"), col("session_time"))

    // B: r16 shape — two window layers, no aggregate, filter session ends
    def sessNew: DataFrame = {
      val startOf = (c: org.apache.spark.sql.Column) =>
        last(when(col("__brk") === 1, c), ignoreNulls = true).over(wRun)
      base
        .withColumn("__brk",
          when(prev.isNull || col("__us") - prev >= gapUs, 1).otherwise(0))
        .withColumn("__end", nxt.isNull || nxt - col("__us") >= gapUs)
        .withColumn("__rn", row_number().over(w))
        .withColumn("__sus", startOf(col("__us")))
        .withColumn("__srn", startOf(col("__rn")))
        .filter(col("__end"))
        .select(col("user_id"),
          timestamp_micros(col("__sus")).as("session_time"),
          (col("__us") - col("__sus")).as("duration_us"),
          (col("__rn") - col("__srn") + 1).cast("long").as("depth"),
          col("__ev").as("end_event"))
        .orderBy(col("user_id"), col("session_time"))
    }

    val cases: Seq[(String, DataFrame)] = Seq("old" -> sessOld, "new" -> sessNew)
    cases.foreach { case (_, df) => df.queryExecution.executedPlan }
    def consume(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
    // warmup (AQE finalization + codegen)
    (1 to 2).foreach(_ => cases.foreach { case (_, df) =>
      spark.catalog.clearCache(); consume(df) })
    val times = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to reps).foreach { _ =>
      cases.foreach { case (name, df) =>
        spark.catalog.clearCache()
        org.apache.spark.graftbench.ShuffleReset.resetAll(spark.sparkContext)
        val t0 = System.nanoTime()
        consume(df)
        times(name) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    cases.foreach { case (name, _) =>
      val s = times(name).sorted
      println(f"[sessab] $name median ${s(s.length / 2)}%.3f min ${s.head}%.3f max ${s.last}%.3f  all ${s.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
