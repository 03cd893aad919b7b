package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev-only: time ONE named query with the exact Bench methodology
  * (prepared plan, 2 warmup consumes, N timed reps over the cached
  * QueryExecution, per-rep clearCache) and optionally print the FINAL
  * adaptive plan after execution — so exchange/stage reuse decisions
  * that only materialize at runtime are visible, not guessed.
  *
  * Usage: runMain graft.tools.BenchOne <sfDir> <name[,name...]> [reps] [plan]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 5
    val showPlan = args.length > 3 && args(3) == "plan"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())
    def consume(df: org.apache.spark.sql.DataFrame): Long = {
      val n = spark.sparkContext.longAccumulator
      df.queryExecution.toRdd.foreachPartition { it =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        n.add(c)
      }
      n.value
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan
      if (sys.env.contains("BENCHONE_DEBUG")) {
        println(s"[benchone] $name collect rows=${df.collect().length}")
        println(s"[benchone] $name toRdd-after-collect rows=${consume(df)}")
        val df2 = SparkEntry.queries(name)(spark, sfDir)
        println(s"[benchone] $name fresh-toRdd rows=${consume(df2)}")
      }
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        println(s"[benchone] $name warmup $i rows=${consume(df)}")
      }
      var rows = -1L
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        // same rep model as Bench (r16): drop registered map outputs so
        // the rep recomputes every stage instead of only the final one
        org.apache.spark.graftbench.ShuffleReset.resetAll(spark.sparkContext)
        val t0 = System.nanoTime()
        rows = consume(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name min=${times.min}%.3f med=${times.sorted.apply(times.length / 2)}%.3f rows=$rows reps=" +
        times.map(t => f"$t%.3f").mkString(","))
      if (showPlan) {
        val s = df.queryExecution.executedPlan.toString
        println(s"[benchone] $name reused-stages=${s.split("\n").count(l => l.contains("ReusedQueryStage") || l.contains("ReusedExchange"))}")
        println(s)
      }
    }
    spark.stop()
  }
}
