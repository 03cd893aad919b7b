package graft.tools

import graft.{Bench, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev-only: split each headline query's steady-state wall clock into
  * PLAN time (DataFrame construction + analysis + optimization +
  * physical planning, i.e. `executedPlan` forced) and RUN time (the
  * noop-sink execution given the pre-built frame). The per-query
  * scheduling floor the bench carries is whichever of the two
  * dominates — this tells us whether to attack the optimizer pass
  * pipeline or the task-dispatch path.
  * Usage: runMain graft.tools.FloorProfile <sfDir> [reps]
  */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())
    val queries = SparkEntry.queries
    Bench.headline.filter(queries.keySet).foreach { name =>
      // warmup: codegen + AQE variants
      (1 to 2).foreach { _ =>
        try queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"$name warmup: ${e.getMessage}") }
      }
      val stats = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis→physical planning
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val plan = stats.map(_._1).sorted.apply(reps / 2)
      val run = stats.map(_._2).sorted.apply(reps / 2)
      println(f"[floor] $name%-32s plan=$plan%.3f run=$run%.3f")
    }
    spark.stop()
  }
}
