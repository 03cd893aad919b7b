package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-order functions (reference src/Functions/runningDifference.h,
  * src/Functions/neighbor.cpp).
  *
  * The reference computes these over the current processing BLOCK — its
  * own docs flag the result as order- and chunk-dependent. On a
  * distributed engine that contract is meaningless (blocks don't exist;
  * partition boundaries are arbitrary), so this surface requires the
  * ordering explicitly and lowers to lag/lead windows — the
  * deterministic form the reference recommends migrating to. One shuffle
  * on the partition key; both functions over the same (partition, order)
  * share a single Window node / sorted pass.
  */
object RowOrder {

  private def w(partition: Seq[Column], order: Seq[Column]) =
    Window.partitionBy(partition: _*).orderBy(order: _*)

  /** runningDifference(x): x minus the previous row's x within the
    * partition; the first row yields the typed zero (the reference
    * returns 0, not NULL, at the front of a block).
    */
  def runningDifference(
      value: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val prev = lag(value, 1).over(w(partition, order))
    when(prev.isNull, value - value).otherwise(value - prev)
  }

  /** runningDifferenceStartingWithFirstValue: like runningDifference but
    * the first row yields its own value instead of the typed zero
    * (reference runningDifferenceStartingWithFirstValue registration in
    * runningDifference.cpp).
    */
  def runningDifferenceStartingWithFirstValue(
      value: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val prev = lag(value, 1).over(w(partition, order))
    when(prev.isNull, value).otherwise(value - prev)
  }

  /** runningAccumulate(agg_state) (reference
    * src/Functions/runningAccumulate.cpp): the running merge of an
    * aggregate state over rows so far — block-order-dependent in the
    * reference, here the deterministic cumulative window
    * (unboundedPreceding..currentRow) over an explicit order, which is
    * the documented migration target. Pass the aggregate column itself
    * (e.g. `sum(x)`, `countDistinct`-style states become their
    * cumulative merge).
    */
  def runningAccumulate(
      agg: Column, partition: Seq[Column], order: Seq[Column]): Column =
    agg.over(w(partition, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** neighbor(x, offset[, default]): the value `offset` rows ahead
    * (negative → behind) in the partition's order; `default` when the
    * neighbor falls outside the partition (the reference falls back to
    * the column type's default when no third argument is given — pass it
    * explicitly here).
    */
  def neighbor(
      value: Column, offset: Int, default: Column,
      partition: Seq[Column], order: Seq[Column]): Column = {
    val win = w(partition, order)
    val shifted =
      if (offset >= 0) lead(value, offset).over(win)
      else lag(value, -offset).over(win)
    coalesce(shifted, default)
  }

  /** runningConcurrency(begin, end) (reference
    * src/Functions/runningConcurrency.cpp: walks rows keeping a multiset
    * of open ends, popping ends ≤ the current begin BEFORE pushing —
    * block-order-dependent for simultaneous begins). Deterministic
    * re-expression as an interval sweep: every interval contributes
    * (+1 at begin, −1 at end), per-instant net deltas are prefix-summed
    * in time order, and each distinct begin instant reports the count of
    * intervals open there — intervals ending exactly at t are already
    * closed (their −1 is included), matching the reference's
    * pop-before-push tie rule; simultaneous begins all count (the
    * reference's per-row walk values depend on intra-block row order,
    * which doesn't exist distributed — this returns that walk's maximum
    * at the instant, the only order-free value). Cost: one shuffle to
    * group instants + one global-ordered prefix sum — the sort-based
    * shape that scales, vs the reference's single-threaded multiset.
    *
    * Input: a DataFrame with `begin`/`end` columns; output: (t, conc)
    * per distinct begin instant.
    */
  def runningConcurrency(
      df: org.apache.spark.sql.DataFrame,
      begin: Column, end: Column): org.apache.spark.sql.DataFrame = {
    val iv = df.select(begin.as("b"), end.as("e"))
    val pts = iv.select(col("b").as("t"), lit(1).as("d"))
      .unionByName(iv.select(col("e").as("t"), lit(-1).as("d")))
    val net = pts.groupBy(col("t")).agg(sum(col("d")).as("nd"))
    val sweep = net.withColumn("conc",
      sum(col("nd")).over(Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sweep.join(iv.select(col("b")).distinct(), col("t") === col("b"))
      .select(col("t"), col("conc").cast("long").as("conc"))
  }
}
