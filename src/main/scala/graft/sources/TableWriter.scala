package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table layout control — the Spark mapping of the reference's MergeTree
  * PARTITION BY / ORDER BY / CLUSTER BY ... INTO n BUCKETS DDL
  * (/root/reference/tests/optimizers/tpch/sql/create_table.sql:1-31):
  * hive-style partition directories (→ Catalyst partition pruning),
  * sortWithinPartitions (→ parquet row-group min/max pruning on the sort
  * key, the PK-range analogue) and bucketBy (→ shuffle-free bucket-aligned
  * joins/aggregations).
  */
object TableWriter {

  /** Write partitioned + sorted parquet. Partition columns become pruning
    * directories; `sortCols` order rows within each file so row-group
    * stats are selective on those keys.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write a bucketed managed table (CLUSTER BY ... INTO n BUCKETS):
    * joins/aggregations on the bucket key skip their shuffle.
    */
  def writeBucketed(
      df: DataFrame,
      spark: SparkSession,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)
}
