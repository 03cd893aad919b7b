package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC external-table connector (reference StorageMySQL/StorageJDBC
  * registration — /root/reference/src/Storages/registerStorages.cpp:110-180):
  * read/write a relational table through Spark's built-in JDBC source.
  *
  * Scale notes baked into the API:
  *  - reads accept a partition spec (column, bounds, n) so the scan issues
  *    n range-predicated queries in parallel instead of one single-threaded
  *    cursor — the only way a JDBC ingest keeps a cluster busy;
  *  - filters and column pruning push into the remote SQL (visible as
  *    PushedFilters on the JDBCRelation scan), so the database ships only
  *    the rows/columns the plan needs.
  */
object JdbcSource {

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.ErrorIfExists,
            properties: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, props)
  }

  def read(spark: SparkSession, url: String, table: String,
           properties: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, props)
  }

  /** Parallel range-partitioned read: `numPartitions` concurrent queries,
    * each scanning one stride of `partitionColumn` in [lower, upper].
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      properties: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)
  }
}
