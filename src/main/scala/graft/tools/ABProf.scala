package graft.tools

import graft.Tables
import graft.aggregates.{BitmapAggregates => B}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Dev-only: A/B the r15 query restructurings (old vs new shape) in one
  * JVM, alternating reps so host drift hits both sides equally.
  */
object ABProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def ts(s: String) = lit(Timestamp.valueOf(s))

    // ---- q3 old/new ----
    def q3(reorder: Boolean): DataFrame = {
      val c = Tables(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(spark, sfDir, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = Tables(spark, sfDir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      val joined =
        if (reorder)
          l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
        else
          l.join(o, col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      joined.groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(graft.Num.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }

    // ---- bitmap old/new ----
    def bmOld: DataFrame = {
      val ev = Tables(spark, sfDir, "events")
      val click = ev.filter(col("event_type") === "click")
        .agg(B.groupBitmap(col("user_id")).as("bm_click"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .agg(B.groupBitmap(col("user_id")).as("bm_purchase"))
      click.crossJoin(purchase).select(
        B.bitmapCardinality(col("bm_click")).as("n_click"),
        B.bitmapCardinality(col("bm_purchase")).as("n_purchase"),
        B.bitmapAndCardinality(col("bm_click"), col("bm_purchase")).as("n_both"),
        B.bitmapOrCardinality(col("bm_click"), col("bm_purchase")).as("n_either"),
        B.bitmapAndnotCardinality(col("bm_click"), col("bm_purchase")).as("n_click_only"))
    }
    def bmNew: DataFrame = {
      val ev = Tables(spark, sfDir, "events")
        .filter(col("event_type").isin("click", "purchase"))
      ev.agg(
          B.groupBitmapIf(when(col("event_type") === "click", col("user_id"))).as("bm_click"),
          B.groupBitmapIf(when(col("event_type") === "purchase", col("user_id"))).as("bm_purchase"))
        .select(
          B.bitmapCardinality(col("bm_click")).as("n_click"),
          B.bitmapCardinality(col("bm_purchase")).as("n_purchase"),
          B.bitmapAndCardinality(col("bm_click"), col("bm_purchase")).as("n_both"),
          B.bitmapOrCardinality(col("bm_click"), col("bm_purchase")).as("n_either"),
          B.bitmapAndnotCardinality(col("bm_click"), col("bm_purchase")).as("n_click_only"))
    }

    // ---- knn_lsh old/new ----
    import graft.functions.VectorFunctions._
    def lsh(persist: Boolean): DataFrame = {
      val nTables = 4
      val bits = 8
      def tableKey(sig: org.apache.spark.sql.Column, t: Int) =
        shiftright(sig, t * bits).bitwiseAND(lit((1L << bits) - 1))
      val emb0 = Tables(spark, sfDir, "embeddings")
        .withColumn("sig", hyperplaneLshBucket(col("embedding"), nTables * bits))
      val emb = if (persist) emb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else emb0
      val corpus = emb.select(col("vec_id"), col("embedding"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("tbl"), tableKey(col("sig"), t).as("key"))): _*)).as("tk"))
        .select(col("vec_id"), col("embedding"),
                col("tk.tbl").as("tbl"), col("tk.key").as("key"))
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"),
          explode(flatten(array((0 until nTables).map(t =>
            transform(multiProbeBuckets(tableKey(col("sig"), t), bits, 2),
              k => struct(lit(t).as("tbl"), k.as("key")))): _*))).as("tk"))
        .select(col("probe_id"), col("probe_vec"),
                col("tk.tbl").as("tbl"), col("tk.key").as("key"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      corpus.join(broadcast(probes), Seq("tbl", "key"))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("sim", round(dot(col("embedding"), col("probe_vec")), 6))
        .groupBy(col("probe_id"), col("vec_id"))
        .agg(max(col("sim")).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"), col("sim"))
        .orderBy(col("probe_id"), col("rn"))
    }

    // ---- q5 old/new (r15 wave 3: pre-aggregate before the customer join) ----
    def q5(preagg: Boolean): DataFrame = {
      val r = Tables(spark, sfDir, "region")
      val n = Tables(spark, sfDir, "nation")
      val c = Tables(spark, sfDir, "customer")
      val sup = Tables(spark, sfDir, "supplier")
      val o = Tables(spark, sfDir, "orders")
      val l = Tables(spark, sfDir, "lineitem")
      val base = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val joined =
        if (preagg)
          base.groupBy(col("o_custkey"), col("s_nationkey"))
            .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                   .cast(graft.Num.D6)).as("__rev"),
                 count(lit(1)).as("__n"))
            .join(c, col("o_custkey") === col("c_custkey") &&
                     col("s_nationkey") === col("c_nationkey"))
            .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
            .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
            .groupBy(col("r_name"), col("n_name"))
            .agg(sum(col("__rev")).cast("double").as("revenue"),
                 sum(col("__n")).as("n_items"))
        else
          base.join(c, col("o_custkey") === col("c_custkey"))
            .filter(col("c_nationkey") === col("s_nationkey"))
            .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
            .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
            .groupBy(col("r_name"), col("n_name"))
            .agg(graft.Num.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
                 count(lit(1)).as("n_items"))
      joined.orderBy(col("r_name"), col("n_name"))
    }

    // ---- agg_rollup old/new (r15 wave 3: rollup over pre-aggregated cells) ----
    def rollup(preagg: Boolean): DataFrame = {
      val o = Tables(spark, sfDir, "orders")
      if (preagg)
        o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("__n"),
               sum(col("o_totalprice").cast(graft.Num.D2)).as("__sum"))
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(sum(col("__n")).as("n_orders"),
               sum(col("__sum")).cast("double").as("sum_price"),
               grouping(col("o_orderstatus")).cast("int").as("g_status"),
               grouping(col("o_orderpriority")).cast("int").as("g_priority"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first)
      else
        o.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
               graft.Num.dsum2(col("o_totalprice")).as("sum_price"),
               grouping(col("o_orderstatus")).cast("int").as("g_status"),
               grouping(col("o_orderpriority")).cast("int").as("g_priority"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first)
    }

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "q5_old" -> (() => q5(false)),
      "q5_new" -> (() => q5(true)),
      "rollup_old" -> (() => rollup(false)),
      "rollup_new" -> (() => rollup(true)))

    // warmup
    cases.foreach { case (_, f) => noop(f()); spark.catalog.clearCache() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to 5).foreach { _ =>
      cases.foreach { case (name, f) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        noop(f())
        times(name) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    cases.foreach { case (name, _) =>
      val s = times(name).sorted
      println(f"[ab] $name median ${s(s.length / 2)}%.3f min ${s.head}%.3f max ${s.last}%.3f  all ${s.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
