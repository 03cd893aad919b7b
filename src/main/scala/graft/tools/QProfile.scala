package graft.tools

import graft.{Tables}
import graft.operators.Quantiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose agg_quantiles cost. */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir, "lineitem")
    li.count()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[qprof] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("q1-decimal") {
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = disc * (lit(1.0) + col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.Num.dsum2(col("l_quantity")), graft.Num.dsum2(col("l_extendedprice")),
             graft.Num.dsum6(disc), graft.Num.dsum6(charge),
             graft.Num.davg2(col("l_quantity")), graft.Num.davg2(col("l_extendedprice")),
             graft.Num.davg2(col("l_discount")), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    time("q1-cents") {
      def c2(c: org.apache.spark.sql.Column) = sum(round(c * 100).cast("long")) / 100.0
      def c6(c: org.apache.spark.sql.Column) = sum(round(c * 1000000).cast("long")) / 1000000.0
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = disc * (lit(1.0) + col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(c2(col("l_quantity")), c2(col("l_extendedprice")), c6(disc), c6(charge),
             c2(col("l_quantity")) / count(lit(1)), c2(col("l_extendedprice")) / count(lit(1)),
             c2(col("l_discount")) / count(lit(1)), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    locally {
      import graft.functions.TextFunctions._
      val docs = Tables(spark, sfDir, "documents")
      val hashed = docs.select(col("doc_id").as("id"),
        explode(shingles(col("text"), 3)).as("sh"))
      time("minhash-shingles-only") { hashed.write.mode("overwrite").format("noop").save() }
      val sig = hashed.groupBy(col("id"))
        .agg(min(xxhash64(lit(0), col("sh"))).as("m0"),
             (1 until 16).map(i => min(xxhash64(lit(i), col("sh"))).as(s"m$i")): _*)
      time("minhash-sig-full") { sig.write.mode("overwrite").format("noop").save() }
    }
    time("quantity-3p") {
      Quantiles.percentiles(li, "l_linestatus", "l_quantity",
        Seq(0.25 -> "a", 0.5 -> "b", 0.75 -> "c")).write.mode("overwrite").format("noop").save()
    }
    time("price-p90") {
      Quantiles.percentiles(li, "l_linestatus", "l_extendedprice",
        Seq(0.9 -> "a")).write.mode("overwrite").format("noop").save()
    }
    time("select-price-p90") {
      Quantiles.percentilesSelect(li, "l_linestatus", "l_extendedprice", 1000.0,
        Seq(0.9 -> "a")).write.mode("overwrite").format("noop").save()
    }
    time("builtin-price-p90") {
      li.groupBy(col("l_linestatus")).agg(expr("percentile(l_extendedprice, 0.9)"))
        .write.mode("overwrite").format("noop").save()
    }
    time("builtin-quantity-3p") {
      li.groupBy(col("l_linestatus")).agg(expr("percentile(l_quantity, 0.25)"),
        expr("percentile(l_quantity, 0.5)"), expr("percentile(l_quantity, 0.75)"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
