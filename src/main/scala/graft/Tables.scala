package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Catalog layer: the driver-generated TPC-H-ish star schema plus the
  * LLM-data-pipeline tables (documents, embeddings, events).
  *
  * Mirrors the reference's table surface (ByConity `StorageCnchMergeTree`,
  * /root/reference/src/Storages/StorageCnchMergeTree.h:38) as plain
  * Parquet-backed Spark tables: scans get Catalyst predicate pushdown,
  * column pruning and row-group pruning for free — the Spark-native
  * equivalent of MergeTree partition/mark pruning
  * (/root/reference/src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp:175).
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val pipeline: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ pipeline

  /** Read one table from an sf directory.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright; read it as raw nanos and floor-divide
    * to a µs timestamp — the same truncation DuckDB applies — so both engines
    * observe identical values.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table of an sf directory as a temp view so that
    * `spark.sql` queries (the engine's SQL front door) resolve them.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
