package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join — for every left row, the latest right row of the same key
  * with right.time <= left.time (backward, non-strict), the reference's
  * Asof join strictness (/root/reference/src/Interpreters/RowRefs.h:210,
  * findAsof:250). Spark has no native ASOF; a naive range join explodes.
  *
  * Implementation is the union + running-`last` rewrite (SURVEY §7.2):
  * tag both inputs, union on (key, time), and take the last right payload
  * seen in a per-key time-ordered running frame. Cost is one shuffle on
  * the key + a per-partition sort — the same plan shape as a sort-merge
  * join, so it scales linearly with input; no O(n·m) pair expansion and
  * no per-key data skew beyond what the key distribution itself carries.
  */
object AsofJoin {

  /** Backward non-strict as-of join.
    *
    * @param left      probe side; all its columns are kept
    * @param right     reference side
    * @param keyLeft   equi-join key on `left`
    * @param keyRight  equi-join key on `right`
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightCols right payload columns to attach (null when no match)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyLeft: String,
      keyRight: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStruct = struct(rightCols.map(right(_)): _*)
    val r2 = right.select(
      right(keyRight).as("__k"),
      right(rightTime).as("__t"),
      lit(0).as("__side"),
      rStruct.as("__r"))
    val rType = r2.schema("__r").dataType
    val l2 = left.select(
      left(keyLeft).as("__k") +:
        left(leftTime).as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast(rType).as("__r") +:
        leftCols.map(left(_)): _*)
    // Right rows sort before left rows at equal time (__side 0 < 1), so a
    // right row at exactly left.time matches — non-strict <=.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r2.select(l2.columns.map {
      case c @ ("__k" | "__t" | "__side" | "__r") => col(c)
      case c => lit(null).cast(l2.schema(c).dataType).as(c)
    }: _*).union(l2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    joined.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  /** Backward non-strict as-of join where BOTH sides come from the same
    * DataFrame, split by side predicates (r15, guide §2.4): the
    * union-of-two-filtered-scans shape of [[backward]] re-reads the base
    * table once per side; tagging sides inside ONE filtered scan halves
    * the base-table passes with the identical window semantics
    * (right rows sort before left rows at equal time → non-strict <=).
    *
    * Rows must satisfy at most one of the predicates (rows matching
    * neither are dropped). Result: `leftCols`, then `key` and `time`
    * under their own names, then `asof_<c>` for each right payload
    * column (null when no preceding right row).
    */
  def backwardSameSource(
      src: DataFrame,
      isLeft: Column,
      isRight: Column,
      key: String,
      time: String,
      leftCols: Seq[String],
      rightCols: Seq[String]): DataFrame = {
    val rStruct = struct(rightCols.map(col): _*)
    val tagged = src.filter(isLeft || isRight)
      .select(col(key).as("__k") +: col(time).as("__t") +:
        when(isLeft, 1).otherwise(0).as("__side") +:
        when(isRight, rStruct).as("__r") +:
        leftCols.map(c => when(isLeft, col(c)).as(c)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        Seq(col("__k").as(key), col("__t").as(time)) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }
}
