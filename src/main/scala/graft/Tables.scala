package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Read one table from an sf directory, normalizing every timestamp
    * column to the engine's canonical `TimestampType` regardless of the
    * physical parquet encoding the generator happened to use. Observed
    * drift across testdata regenerations:
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
    *     read as raw nanos and floor-divide to µs — the same truncation
    *     DuckDB applies — so both engines observe identical values.
    *   - timestamp[us] with no isAdjustedToUTC flag: Spark 4 infers
    *     TIMESTAMP_NTZ, on which strictly-typed calls (`unix_micros`,
    *     window lag over ts, ASOF inequalities) throw DATATYPE_MISMATCH.
    *     Cast NTZ → TimestampType; with the session timezone pinned to
    *     UTC (every Engine/Verify/Bench builder does) the wall-clock
    *     reinterpretation is value-identical to DuckDB's NTZ reading.
    *
    * The reference's DateTime is timezone-less by construction
    * (/root/reference/src/DataTypes/DataTypeDateTime.h:54) and immune to
    * this class of drift; this choke point is the Spark-native analogue —
    * every query path reads tables through here, so one cast repairs all.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.withColumns(
      ntz.map(f => f.name -> col(f.name).cast(TimestampType)).toMap)
  }

  /** Canonical timestamp→µs conversion — the ONE strictly-typed call
    * site. `unix_micros` is typed to TIMESTAMP and throws
    * DATATYPE_MISMATCH on TIMESTAMP_NTZ; the inner cast is a no-op on
    * already-canonical columns, reinterprets NTZ under the pinned UTC
    * session tz (value-identical to the oracle's reading), and gives
    * future encoding drift a single repair point instead of ~40
    * scattered `unix_micros(col("ts"))` calls — the round-7 failure
    * mode. Every operator needing event-time µs must go through here.
    */
  def tsUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Register every table of an sf directory as a temp view so that
    * `spark.sql` queries (the engine's SQL front door) resolve them.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
