package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: deterministically scale an existing SF directory by K× for
  * SCALING MEASUREMENTS (8-core vs 32-core ratios). sf0.1's per-query
  * times are 5–80 ms — fixed per-stage overhead, non-diagnostic for
  * parallelism (r15 verdict item 7) — so this synthesizes a K×-bigger
  * corpus by unioning K key-shifted copies of every table:
  *
  *  - fact/entity keys are offset per copy by a round power of ten above
  *    the table's max key, so copies never collide and join fan-outs
  *    (customer↔orders↔lineitem, events.user_id, embeddings.vec_id)
  *    replicate per copy → every query's work scales ~linearly;
  *  - nation/region (shared dimensions) are NOT replicated — foreign
  *    keys into them stay valid;
  *  - documents' text is token-salted per copy (every token gets a
  *    "_cK" suffix), keeping copy vocabularies disjoint: near-dup pairs
  *    replicate per copy instead of exploding quadratically across
  *    copies (exact duplicates would pair with every other copy);
  *  - copy 0 is byte-identical to the source, so probe filters
  *    (vec_id < 10, centroid seeds < 16) keep their original rows and
  *    the probe side stays fixed-size while the corpus grows.
  *
  * NOT an oracle scale: this data is for perf/scaling evidence only.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // next power of ten ≥ max+1, so shifted ids stay readable and mod-k
    // blocking predicates (doc_id % 5) keep their selectivity per copy
    def offsetFor(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).head().getAs[Number](0).longValue()
      var p = 10L
      while (p <= mx) p *= 10
      p
    }

    def shifted(table: String, keys: Seq[String], salt: Option[String] = None): DataFrame = {
      val df = Tables(spark, src, table)
      val offs = keys.map(k => k -> offsetFor(df, k)).toMap
      (0 until copies).map { i =>
        val withKeys = keys.foldLeft(df)((d, k) =>
          // cast back so the scaled table's schema is byte-identical
          d.withColumn(k, (col(k) + lit(offs(k) * i)).cast(df.schema(k).dataType)))
        salt match {
          case Some(textCol) if i > 0 =>
            withKeys.withColumn(textCol,
              array_join(transform(split(col(textCol), " "),
                t => concat(t, lit(s"_c$i"))), " "))
          case _ => withKeys
        }
      }.reduce(_ unionByName _)
    }

    val plan: Seq[(String, DataFrame)] = Seq(
      "customer" -> shifted("customer", Seq("c_custkey")),
      "orders" -> shifted("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem" -> shifted("lineitem", Seq("l_orderkey", "l_suppkey", "l_partkey")),
      "supplier" -> shifted("supplier", Seq("s_suppkey")),
      "part" -> shifted("part", Seq("p_partkey")),
      "nation" -> Tables(spark, src, "nation"),
      "region" -> Tables(spark, src, "region"),
      "events" -> shifted("events", Seq("user_id")),
      "documents" -> shifted("documents", Seq("doc_id"), salt = Some("text")),
      "embeddings" -> shifted("embeddings", Seq("vec_id")))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    plan.foreach { case (name, df) =>
      df.coalesce(4).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] wrote $name")
    }
    spark.stop()
  }
}
