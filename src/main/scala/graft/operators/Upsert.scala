package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unique-key table semantics (reference UniqueKeyIndex,
  * /root/reference/src/Storages/UniqueKeyIndex.h:25 — upsert by key with
  * last-writer-wins on a version column) emulated over append-only
  * parquet as dedup-on-read: one shuffle on the key, row_number = 1 by
  * (version desc, tiebreaker desc). The same plan is the batch path of a
  * MERGE INTO.
  */
object Upsert {

  /** Latest state per key: keep the row with the greatest (version,
    * tiebreak) per key column set.
    */
  def latestByVersion(
      df: DataFrame,
      keys: Seq[String],
      version: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(version).desc, col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic-by-key sampling (reference SAMPLE BY — a deterministic
    * subrange of the sampling key, MergeTreeDataSelectExecutor.cpp:470):
    * rows whose key-digest hex prefix falls in the accepted set, i.e. a
    * take/16 fraction. Same rows selected on any engine, any run, any
    * parallelism.
    */
  def sampleByKey(key: Column, take: Int): Column =
    substring(md5(key.cast("string")), 1, 1) <
      lit("0123456789abcdefg".charAt(take).toString)
}

/** Skew mitigation for hot join keys: salt the build side by replication,
  * the probe side by random-but-deterministic assignment (reference
  * handles this with its repartition exchange; Spark's AQE skew-join
  * covers sort-merge cases — salting covers hash aggregation and
  * non-AQE-eligible joins).
  */
object SkewJoin {

  /** Inner equi-join with the right side replicated across `salt`
    * sub-keys; left rows assigned a deterministic salt from a row digest.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salt: Int): DataFrame = {
    val salted = (0 until salt).map(lit(_))
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(array(salted: _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
