package graft.tools

import graft.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose jaccard_token_pairs (prefix-filtered) cost. */
object JProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.cbo.enabled", sys.env.getOrElse("JP_CBO", "true"))
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        sys.env.getOrElse("JP_BLOOM", "true"))
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsIn = Tables(spark, sfDir, "documents").filter(col("doc_id") % 5 === 0)
    docsIn.count()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[jprof] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
      }
    }
    def toks = docsIn.select(col("doc_id").as("id"),
        explode(array_distinct(tokens(col("text")))).as("tok_s"))
      .select(col("id"), xxhash64(col("tok_s")).as("tok"))
    time("toks-scan") {
      toks.write.mode("overwrite").format("noop").save()
    }
    time("dftok-agg") {
      toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs-build") {
      val dfTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      toks.join(dfTok, "tok")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("dt"))
        .select(col("id"), expr("transform(dt, x -> x.tok)").as("ts"),
          size(col("dt")).as("n_tok"))
        .write.mode("overwrite").format("noop").save()
    }
    time("full-query") {
      graft.operators.Dedup.jaccardPairs(docsIn, "text", "doc_id", 0.62)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
