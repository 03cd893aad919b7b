package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Cohort-retention matrix aggregates (reference
  * AggregateFunctionRetention2.h:46 `retention2`,
  * AggregateFunctionRetention4.h:38 `retention4`).
  *
  * Input is one row per user carrying that user's activity-day index
  * arrays; state is a fixed dense Long matrix (window², or span×window),
  * so the shuffle ships a few hundred counters per partition regardless
  * of user count — the same reason the reference packs day bitmasks.
  */
object RetentionMatrix {

  /** Per-user day-index arrays: days with a start/first event and days
    * with an end/retention event (indices relative to the window origin).
    */
  final case class UserDays(startDays: Seq[Int], endDays: Seq[Int])

  /** One matrix cell: users who started on `i` and (for j>i) returned on
    * `j`; the diagonal j==i carries the day-i starter count.
    */
  final case class RetCell(i: Int, j: Int, users: Long)

  private def toFlags(days: Seq[Int], n: Int): Array[Boolean] = {
    val f = new Array[Boolean](n)
    days.foreach(d => if (d >= 0 && d < n) f(d) = true)
    f
  }

  /** retention2(window): window×window upper-triangle matrix. Diagonal
    * [i][i] counts users with a start event on day i; [i][j], j>i, counts
    * users with a start on i AND an end event on j (reference
    * AggregateFunctionRetention2.h:260-340 — diagonal is the cohort size,
    * strictly-greater j is the retained count).
    */
  class Retention2(window: Int)
      extends Aggregator[UserDays, Array[Long], Seq[RetCell]] with Serializable {
    def zero: Array[Long] = new Array[Long](window * window)
    def reduce(v: Array[Long], u: UserDays): Array[Long] = {
      val s = toFlags(u.startDays, window)
      val e = toFlags(u.endDays, window)
      var i = 0
      while (i < window) {
        if (s(i)) {
          v(i * window + i) += 1
          var j = i + 1
          while (j < window) {
            if (e(j)) v(i * window + j) += 1
            j += 1
          }
        }
        i += 1
      }
      v
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(v: Array[Long]): Seq[RetCell] =
      for (i <- 0 until window; j <- i until window)
        yield RetCell(i, j, v(i * window + j))
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[RetCell]] = ExpressionEncoder[Seq[RetCell]]()
  }

  def retention2(window: Int): UserDefinedFunction =
    udaf(new Retention2(window), Encoders.product[UserDays])

  /** retention4(window, span): first-event-anchored cohorts. Per user,
    * f = earliest start day within [0, span); cell [f][0] counts the
    * cohort, [f][k] (0<k<window) counts users retained exactly k days
    * after their first day (reference AggregateFunctionRetention4.h:77 —
    * values[first*window + pos-first]).
    */
  class Retention4(window: Int, span: Int)
      extends Aggregator[UserDays, Array[Long], Seq[RetCell]] with Serializable {
    def zero: Array[Long] = new Array[Long](span * window)
    def reduce(v: Array[Long], u: UserDays): Array[Long] = {
      val firsts = u.startDays.filter(d => d >= 0 && d < span)
      if (firsts.nonEmpty) {
        val f = firsts.min
        v(f * window) += 1
        val ret = toFlags(u.endDays.map(_ - f), window)
        var k = 1
        while (k < window) {
          if (ret(k)) v(f * window + k) += 1
          k += 1
        }
      }
      v
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(v: Array[Long]): Seq[RetCell] =
      for (f <- 0 until span; k <- 0 until window)
        yield RetCell(f, k, v(f * window + k))
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[RetCell]] = ExpressionEncoder[Seq[RetCell]]()
  }

  def retention4(window: Int, span: Int): UserDefinedFunction =
    udaf(new Retention4(window, span), Encoders.product[UserDays])
}
