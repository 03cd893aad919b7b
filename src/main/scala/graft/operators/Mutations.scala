package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch mutations — the reference's ALTER TABLE ... UPDATE/DELETE
  * (/root/reference/src/Interpreters/MutationsInterpreter.cpp) are
  * asynchronous whole-part rewrites; the Spark-native equivalent is a
  * read → transform → overwrite cycle (same semantics, same full-scan
  * cost model). Update = conditional column replacement; delete =
  * anti-filter.
  */
object Mutations {

  /** UPDATE t SET col = value WHERE cond. */
  def update(df: DataFrame, cond: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(df) { case (d, (name, value)) =>
      d.withColumn(name, when(cond, value).otherwise(col(name)))
    }

  /** DELETE FROM t WHERE cond. */
  def delete(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** Apply a mutation pipeline and atomically replace the table directory
    * (write to a sibling temp path, then swap) — the part-rewrite commit.
    */
  def rewrite(spark: SparkSession, path: String, mutate: DataFrame => DataFrame): Unit = {
    val tmp = path + ".mutating"
    mutate(spark.read.parquet(path)).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
