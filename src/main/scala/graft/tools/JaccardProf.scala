package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only: decompose jaccard_token_pairs cost and time candidate
  * restructurings (r15 optimization round).
  */
object JaccardProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsTable = Tables(spark, sfDir, "documents").filter(col("doc_id") % 5 === 0)
    docsTable.count()
    val threshold = 0.62

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 4).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"[jprof] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    def toks = docsTable.select(col("doc_id").as("id"),
        explode(array_distinct(tokens(col("text")))).as("tok_s"))
      .select(col("id"), xxhash64(col("tok_s")).as("tok"))

    def prefixDocs: DataFrame = {
      val dfTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      toks.join(dfTok, "tok")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("dt"))
        .select(col("id"),
          expr("transform(dt, x -> x.tok)").as("ts"),
          size(col("dt")).as("n_tok"))
        .withColumn("p",
          (col("n_tok") - ceil(lit(threshold) * col("n_tok")) + 1).cast("int"))
    }

    // Stage timings
    time("1 toks only")(noop(toks))
    time("2 dfTok agg")(noop(toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))))
    time("3 prefixDocs")(noop(prefixDocs))

    def candidates(docs: DataFrame): DataFrame = {
      val prefix = docs.select(col("id"),
        explode(call_function("slice", col("ts"), lit(1), col("p"))).as("tok"))
      prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
    }

    def verify(cands: DataFrame, docs: DataFrame): DataFrame =
      cands
        .join(docs.select(col("id").as("id_a"), col("ts").as("ts_a"), col("n_tok").as("n_a")), "id_a")
        .join(docs.select(col("id").as("id_b"), col("ts").as("ts_b"), col("n_tok").as("n_b")), "id_b")
        .withColumn("n_inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

    // Current shape: persist docs, self-join candidates, 2 joins back.
    time("4 current (persist)") {
      val docs = prefixDocs.persist(StorageLevel.MEMORY_AND_DISK)
      noop(verify(candidates(docs), docs).orderBy(col("id_a"), col("id_b")))
      docs.unpersist()
    }

    // Variant A: same shape, no persist (subtree recomputed 3x).
    time("5 variant A (no persist)") {
      val docs = prefixDocs
      noop(verify(candidates(docs), docs).orderBy(col("id_a"), col("id_b")))
    }

    // Variant B: bucketPairs-style candidates (groupBy tok + local pair
    // expansion) instead of self-join; persist kept for the verify joins.
    time("6 variant B (bucket cands)") {
      val docs = prefixDocs.persist(StorageLevel.MEMORY_AND_DISK)
      val cands = docs.select(col("id"),
          explode(call_function("slice", col("ts"), lit(1), col("p"))).as("tok"))
        .groupBy(col("tok"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids) - i - 1),
            |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("pr"))
        .select(col("pr.id_a"), col("pr.id_b"))
        .distinct()
      noop(verify(cands, docs).orderBy(col("id_a"), col("id_b")))
      docs.unpersist()
    }

    // Variant C: carry payloads through bucket pairs — zero joins back.
    time("7 variant C (payload pairs)") {
      val docs = prefixDocs
      val cands = docs.select(col("id"), col("ts"), col("n_tok"),
          explode(call_function("slice", col("ts"), lit(1), col("p"))).as("tok"))
        .groupBy(col("tok"))
        .agg(sort_array(collect_list(struct(col("id"), col("ts"), col("n_tok")))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds) - i - 1),
            |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("pr"))
        .select(col("pr.a.id").as("id_a"), col("pr.b.id").as("id_b"),
                col("pr.a.ts").as("ts_a"), col("pr.b.ts").as("ts_b"),
                col("pr.a.n_tok").as("n_a"), col("pr.b.n_tok").as("n_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(first(col("ts_a")).as("ts_a"), first(col("ts_b")).as("ts_b"),
             first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      val out = cands
        .withColumn("n_inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      noop(out.orderBy(col("id_a"), col("id_b")))
    }

    // Variant D (r16): no persist, but an EXPLICIT id-repartition above the
    // per-doc aggregate as the shared materialization boundary. All four
    // consumers (prefix stream + prefix broadcast + two verify sides) hang
    // off the identical exchange subtree, so AQE's stage cache derives docs
    // ONCE per fresh execution — the reduce-side collect_list no longer
    // re-runs per consumer the way variant A's does.
    time("8 variant D (repartition boundary)") {
      val docs = prefixDocs.repartition(col("id"))
      noop(verify(candidates(docs), docs).orderBy(col("id_a"), col("id_b")))
    }

    // Variant E (r16): ONE documents scan — plain token arrays per doc
    // first, token df derived by exploding those arrays (not by re-scanning
    // the table), then the (df, tok)-ordered arrays rebuilt via one more
    // explode + broadcast df join + re-agg.
    time("9 variant E (single scan)") {
      val docsRaw = toks.groupBy(col("id"))
        .agg(collect_list(col("tok")).as("rs"))
        .repartition(col("id"))
      val dfTok = docsRaw.select(explode(col("rs")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val docs = docsRaw.select(col("id"), explode(col("rs")).as("tok"))
        .join(dfTok, "tok")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("dt"))
        .select(col("id"),
          expr("transform(dt, x -> x.tok)").as("ts"),
          size(col("dt")).as("n_tok"))
        .withColumn("p",
          (col("n_tok") - ceil(lit(threshold) * col("n_tok")) + 1).cast("int"))
        .repartition(col("id"))
      noop(verify(candidates(docs), docs).orderBy(col("id_a"), col("id_b")))
    }

    spark.stop()
  }
}
