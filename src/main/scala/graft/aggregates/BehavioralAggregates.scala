package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Behavioral/funnel analytics aggregates, the reference's signature
  * aggregate family (windowFunnel —
  * /root/reference/src/AggregateFunctions/AggregateFunctionWindowFunnel.h:134,
  * retention — AggregateFunctionRetention.h:66, sequenceMatch —
  * AggregateFunctionSequenceMatch.h:566), rebuilt as Spark
  * `Aggregator`s so they run as ordinary hash aggregates: partial buffers
  * merge map-side, so the shuffle carries one buffer per (user, partition) —
  * not the raw event stream.
  */
final case class FunnelEvent(us: Long, step: Int)

/** windowFunnel(window, steps)(ts_us, step): max funnel level reached,
  * the reference's getEventLevel algorithm
  * (/root/reference/src/AggregateFunctions/AggregateFunctionWindowFunnel.h:153-213):
  * events sorted by (ts, step); a level-0 slot re-anchors on EVERY step-1
  * event; a step-k event extends the chain when the (k-1) slot is set and
  * its ts is within `windowUs` of that chain's own step-1 anchor
  * (windowUs <= 0 → unbounded). Equal timestamps are allowed by default;
  * options mirror the reference's `strict_deduplication`, `strict_order`
  * and `strict_increase` parameters. For strict_order, feed non-funnel
  * events as step 0. Returns the max level reached (0..nSteps).
  *
  * The buffer holds the per-user candidate events (bounded by per-user
  * activity, not table size); merge is concatenation so the aggregate is
  * associative and safe under Spark's partial/final split.
  */
class WindowFunnel(
    windowUs: Long,
    nSteps: Int,
    strictDeduplication: Boolean = false,
    strictOrder: Boolean = false,
    strictIncrease: Boolean = false)
    extends Aggregator[FunnelEvent, ArrayBuffer[FunnelEvent], Int] with Serializable {
  def zero: ArrayBuffer[FunnelEvent] = ArrayBuffer.empty
  def reduce(b: ArrayBuffer[FunnelEvent], e: FunnelEvent): ArrayBuffer[FunnelEvent] = {
    // us >= 0: FunnelCore's packed representation is unsigned (the
    // reference's timestamps are UInt types).
    if (e.us >= 0 && ((e.step >= 1 && e.step <= nSteps) || (strictOrder && e.step == 0))) b += e
    b
  }
  def merge(a: ArrayBuffer[FunnelEvent], b: ArrayBuffer[FunnelEvent]): ArrayBuffer[FunnelEvent] = {
    a ++= b; a
  }
  def finish(b: ArrayBuffer[FunnelEvent]): Int = {
    val packed = new Array[Long](b.length)
    var i = 0
    while (i < b.length) { packed(i) = FunnelCore.pack(b(i).us, b(i).step); i += 1 }
    java.util.Arrays.sort(packed)
    FunnelCore.eventLevel(packed, packed.length, windowUs, nSteps,
      strictDeduplication, strictOrder, strictIncrease)
  }
  def bufferEncoder: Encoder[ArrayBuffer[FunnelEvent]] = Encoders.kryo
  def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

object WindowFunnel {
  /** Column form: windowFunnel(col(ts_us), col(step)). */
  def apply(windowUs: Long, nSteps: Int): UserDefinedFunction =
    udaf(new WindowFunnel(windowUs, nSteps), Encoders.product[FunnelEvent])

  /** Full-option form mirroring the reference's funnel parameters. */
  def apply(windowUs: Long, nSteps: Int, strictDeduplication: Boolean,
            strictOrder: Boolean, strictIncrease: Boolean): UserDefinedFunction =
    udaf(new WindowFunnel(windowUs, nSteps, strictDeduplication, strictOrder, strictIncrease),
         Encoders.product[FunnelEvent])
}

final case class RetentionInput(c1: Boolean, c2: Boolean, c3: Boolean)

/** retention(c1, c2, c3): per the reference semantics, flag r1 = any event
  * satisfied c1; r_i (i>1) = r1 AND any event satisfied c_i. Returned as
  * 0/1 ints ready to be summed across users.
  */
class Retention extends Aggregator[RetentionInput, Array[Boolean], Seq[Int]] with Serializable {
  def zero: Array[Boolean] = Array(false, false, false)
  def reduce(b: Array[Boolean], e: RetentionInput): Array[Boolean] = {
    b(0) |= e.c1; b(1) |= e.c2; b(2) |= e.c3; b
  }
  def merge(a: Array[Boolean], b: Array[Boolean]): Array[Boolean] = {
    a(0) |= b(0); a(1) |= b(1); a(2) |= b(2); a
  }
  def finish(b: Array[Boolean]): Seq[Int] =
    Seq(if (b(0)) 1 else 0,
        if (b(0) && b(1)) 1 else 0,
        if (b(0) && b(2)) 1 else 0)
  def bufferEncoder: Encoder[Array[Boolean]] = ExpressionEncoders.arrayBoolean
  def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoders.seqInt
}

object Retention {
  def apply(): UserDefinedFunction =
    udaf(new Retention, Encoders.product[RetentionInput])
}

private[aggregates] object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayBoolean: Encoder[Array[Boolean]] = ExpressionEncoder[Array[Boolean]]()
  val seqInt: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
  val seqLong: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  val mapStringDouble: Encoder[Map[String, Double]] = ExpressionEncoder[Map[String, Double]]()
}
