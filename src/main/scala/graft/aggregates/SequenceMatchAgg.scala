package graft.aggregates

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** The reference's sequenceMatch / sequenceCount pattern DSL
  * (/root/reference/src/AggregateFunctions/AggregateFunctionSequenceMatch.h:566-596
  * parsePattern, :320 dfaMatch, :384 backtrackingMatch), re-implemented
  * over a flat (timestamp, event-bitset) pair buffer.
  *
  * Pattern language:
  *   - `(?N)`    event condition N (1-based) holds on this row
  *   - `.`       any row (of the rows where >=1 condition holds — rows
  *               with no condition set are dropped at add time, as in the
  *               reference's `Data::add`)
  *   - `.*`      any number of rows (including none)
  *   - `(?t<=D)` / `(?t<D)` / `(?t>=D)` / `(?t>D)` / `(?t==D)` — time
  *     constraint between the previous matched row (the "base") and the
  *     row about to be matched, D in the unit of the timestamp column
  *
  * Patterns without time constraints run on the linear DFA path; patterns
  * with time run the backtracking engine (same split as the reference).
  * Time semantics exploit the sort: each time-op admits any later row
  * whose timestamp satisfies the comparison against base + D.
  */
object SequenceCore {

  // Action opcodes (reference PatternActionType, same order).
  final val SpecificEvent = 0
  final val AnyEvent = 1
  final val KleeneStar = 2
  final val TimeLessOrEqual = 3
  final val TimeLess = 4
  final val TimeGreaterOrEqual = 5
  final val TimeGreater = 6
  final val TimeEqual = 7

  /** Parse result: `ops`/`extras` are the action list (extras = event
    * index for SpecificEvent, duration for time ops); the dfa* arrays are
    * the reference's DFAState list for time-free patterns.
    * dfaTransition: 0 = none, 1 = specific event, 2 = any event.
    */
  final case class Pattern(
      ops: Array[Int],
      extras: Array[Long],
      hasTime: Boolean,
      dfaTransition: Array[Int],
      dfaEvent: Array[Int],
      dfaKleene: Array[Boolean])

  final val MaxIterations = 1000000L

  def parse(pattern: String, nFlags: Int): Pattern = {
    require(nFlags >= 1 && nFlags <= 32, s"sequence pattern supports 1..32 events, got $nFlags")
    val ops = scala.collection.mutable.ArrayBuffer[Int](KleeneStar)
    val extras = scala.collection.mutable.ArrayBuffer[Long](0L)
    // DFA states: parallel arrays; state 0 pre-seeded with has_kleene.
    val dTrans = scala.collection.mutable.ArrayBuffer[Int](0)
    val dEvent = scala.collection.mutable.ArrayBuffer[Int](0)
    val dKleene = scala.collection.mutable.ArrayBuffer[Boolean](true)
    var hasTime = false

    var pos = 0
    val len = pattern.length
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"sequence pattern syntax error: $msg at position $pos in '$pattern'")
    def tryMatch(s: String): Boolean =
      if (pattern.startsWith(s, pos)) { pos += s.length; true } else false
    def readLong(): Long = {
      val start = pos
      while (pos < len && pattern.charAt(pos).isDigit) pos += 1
      if (pos == start) fail("could not parse number")
      pattern.substring(start, pos).toLong
    }

    while (pos < len) {
      if (tryMatch("(?")) {
        if (tryMatch("t")) {
          val op =
            if (tryMatch("<=")) TimeLessOrEqual
            else if (tryMatch("<")) TimeLess
            else if (tryMatch(">=")) TimeGreaterOrEqual
            else if (tryMatch(">")) TimeGreater
            else if (tryMatch("==")) TimeEqual
            else fail("unknown time condition")
          val dur = readLong()
          ops.last match {
            case SpecificEvent | AnyEvent | KleeneStar => ()
            case _ => fail("temporal condition must be preceded by an event condition")
          }
          hasTime = true
          ops += op; extras += dur
        } else {
          val n = readLong()
          if (n < 1 || n > nFlags) fail(s"event number $n out of range [1, $nFlags]")
          ops += SpecificEvent; extras += (n - 1)
          dTrans(dTrans.size - 1) = 1
          dEvent(dEvent.size - 1) = (n - 1).toInt
          dTrans += 0; dEvent += 0; dKleene += false
        }
        if (!tryMatch(")")) fail("expected closing parenthesis")
      } else if (tryMatch(".*")) {
        ops += KleeneStar; extras += 0L
        dKleene(dKleene.size - 1) = true
      } else if (tryMatch(".")) {
        ops += AnyEvent; extras += 0L
        dTrans(dTrans.size - 1) = 2
        dTrans += 0; dEvent += 0; dKleene += false
      } else fail("unexpected symbol")
    }
    Pattern(ops.toArray, extras.toArray, hasTime,
      dTrans.toArray, dEvent.toArray, dKleene.toArray)
  }

  /** Time-free path: the reference's dfaMatch — O(states × events), no
    * backtracking stack.
    */
  def dfaMatch(p: Pattern, ts: Array[Long], bits: Array[Long], begin: Int, end: Int): Boolean = {
    val m = p.dfaTransition.length
    var active = new Array[Boolean](m)
    var next = new Array[Boolean](m)
    active(0) = true
    var nActive = 1
    var i = begin
    while (i < end && nActive > 0 && !active(m - 1)) {
      nActive = 0
      java.util.Arrays.fill(next, false)
      var s = 0
      while (s < m) {
        if (active(s)) {
          p.dfaTransition(s) match {
            case 0 => ()
            case 1 =>
              if (((bits(i) >>> p.dfaEvent(s)) & 1L) == 1L) { next(s + 1) = true; nActive += 1 }
            case 2 => next(s + 1) = true; nActive += 1
          }
          if (p.dfaKleene(s)) { next(s) = true; nActive += 1 }
        }
        s += 1
      }
      val t = active; active = next; next = t
      i += 1
    }
    active(m - 1)
  }

  /** Backtracking engine (reference backtrackingMatch) on rows
    * [begin, end) of the sorted pair buffer. Returns (matched, finalIt) —
    * finalIt is where the scan cursor ended, the resume point for
    * sequenceCount's greedy repetition.
    */
  def backtrackingMatch(
      p: Pattern, ts: Array[Long], bits: Array[Long], begin: Int, end: Int): (Boolean, Int) = {
    val nActions = p.ops.length
    var actionIt = 0
    var eventIt = begin
    var baseIt = begin
    // Stack of (action, event, base) triples, flattened.
    var stack = new Array[Int](24)
    var sp = 0
    def push(a: Int, e: Int, b: Int): Unit = {
      if (sp + 3 > stack.length) stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      stack(sp) = a; stack(sp + 1) = e; stack(sp + 2) = b; sp += 3
    }
    def backtrack(): Boolean = {
      while (sp > 0) {
        sp -= 3
        actionIt = stack(sp); eventIt = stack(sp + 1) + 1; baseIt = stack(sp + 2)
        if (eventIt != end) return true
      }
      false
    }

    var iterations = 0L
    var broke = false
    while (!broke && actionIt != nActions && eventIt != end) {
      val op = p.ops(actionIt)
      val extra = p.extras(actionIt)
      op match {
        case SpecificEvent =>
          if (((bits(eventIt) >>> extra.toInt) & 1L) == 1L) {
            baseIt = eventIt; actionIt += 1; eventIt += 1
          } else if (!backtrack()) broke = true
        case AnyEvent =>
          baseIt = eventIt; actionIt += 1; eventIt += 1
        case KleeneStar =>
          push(actionIt, eventIt, baseIt)
          baseIt = eventIt; actionIt += 1
        case TimeLessOrEqual =>
          if (ts(eventIt) <= ts(baseIt) + extra) {
            push(actionIt, eventIt, baseIt)
            baseIt = eventIt; actionIt += 1
          } else if (!backtrack()) broke = true
        case TimeLess =>
          if (ts(eventIt) < ts(baseIt) + extra) {
            push(actionIt, eventIt, baseIt)
            baseIt = eventIt; actionIt += 1
          } else if (!backtrack()) broke = true
        case TimeGreaterOrEqual =>
          if (ts(eventIt) >= ts(baseIt) + extra) {
            push(actionIt, eventIt, baseIt)
            baseIt = eventIt; actionIt += 1
          } else { eventIt += 1; if (eventIt == end && !backtrack()) broke = true }
        case TimeGreater =>
          if (ts(eventIt) > ts(baseIt) + extra) {
            push(actionIt, eventIt, baseIt)
            baseIt = eventIt; actionIt += 1
          } else { eventIt += 1; if (eventIt == end && !backtrack()) broke = true }
        case TimeEqual =>
          if (ts(eventIt) == ts(baseIt) + extra) {
            push(actionIt, eventIt, baseIt)
            baseIt = eventIt; actionIt += 1
          } else { eventIt += 1; if (eventIt == end && !backtrack()) broke = true }
      }
      iterations += 1
      if (iterations > MaxIterations)
        throw new IllegalStateException(
          s"sequence pattern too difficult: exceeded $MaxIterations iterations")
    }

    // Trailing actions that match the empty tail (reference: "match
    // multiple empty strings at end") — with an explicit bound check.
    while (actionIt < nActions && (p.ops(actionIt) match {
      case KleeneStar | TimeLessOrEqual | TimeLess => true
      case TimeGreaterOrEqual => p.extras(actionIt) == 0L
      case _ => false
    })) actionIt += 1

    if (eventIt == begin) eventIt += 1 // progress guarantee for count()
    (actionIt == nActions, eventIt)
  }

  def matches(p: Pattern, ts: Array[Long], bits: Array[Long], n: Int): Boolean =
    if (p.hasTime) backtrackingMatch(p, ts, bits, 0, n)._1
    else dfaMatch(p, ts, bits, 0, n)

  /** sequenceCount: greedy non-overlapping repetition of the backtracking
    * matcher (the reference always counts via backtrackingMatch, even for
    * time-free patterns).
    */
  def count(p: Pattern, ts: Array[Long], bits: Array[Long], n: Int): Long = {
    var c = 0L
    var it = 0
    var go = it != n
    while (go) {
      val (m, next) = backtrackingMatch(p, ts, bits, it, n)
      it = next
      if (m) c += 1
      go = m && it != n
    }
    c
  }

  /** Sort the pair arrays [0, n) lexicographically by (ts, bits). The
    * reference sorts by timestamp only with an unstable sort — tie order
    * among equal timestamps is unspecified there; (ts, bits) makes ours
    * deterministic.
    */
  def sortPairs(ts: Array[Long], bits: Array[Long], n: Int): Unit = {
    def swap(i: Int, j: Int): Unit = {
      val t = ts(i); ts(i) = ts(j); ts(j) = t
      val b = bits(i); bits(i) = bits(j); bits(j) = b
    }
    def less(i: Int, j: Int): Boolean =
      ts(i) < ts(j) || (ts(i) == ts(j) && bits(i) < bits(j))
    def lessV(tv: Long, bv: Long, j: Int): Boolean =
      tv < ts(j) || (tv == ts(j) && bv < bits(j))
    def sort(lo: Int, hi: Int): Unit = { // [lo, hi)
      if (hi - lo < 16) {
        var i = lo + 1
        while (i < hi) {
          val tv = ts(i); val bv = bits(i)
          var j = i - 1
          while (j >= lo && lessV(tv, bv, j)) { ts(j + 1) = ts(j); bits(j + 1) = bits(j); j -= 1 }
          ts(j + 1) = tv; bits(j + 1) = bv
          i += 1
        }
      } else {
        val mid = lo + (hi - lo) / 2
        if (less(mid, lo)) swap(lo, mid)
        if (less(hi - 1, lo)) swap(lo, hi - 1)
        if (less(hi - 1, mid)) swap(mid, hi - 1)
        val pt = ts(mid); val pb = bits(mid)
        var i = lo; var j = hi - 1
        while (i <= j) {
          while (ts(i) < pt || (ts(i) == pt && bits(i) < pb)) i += 1
          while (pt < ts(j) || (pt == ts(j) && pb < bits(j))) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j + 1) sort(lo, j + 1)
        if (i < hi) sort(i, hi)
      }
    }
    sort(0, n)
  }
}

/** Growable (ts, bits) pair buffer; merges by concatenation, serializes
  * to packed little-endian longs (same shape as [[FunnelBuf]]).
  */
final class SeqBuf(var ts: Array[Long], var bits: Array[Long], var n: Int) {
  def add(t: Long, b: Long): Unit = {
    if (n == ts.length) {
      val cap = math.max(8, ts.length * 2)
      ts = java.util.Arrays.copyOf(ts, cap)
      bits = java.util.Arrays.copyOf(bits, cap)
    }
    ts(n) = t; bits(n) = b
    n += 1
  }
}

/** Shared TypedImperativeAggregate plumbing for sequenceMatch /
  * sequenceCount: children are (timestamp, event-bitset) expressions;
  * the pattern is a construction-time parameter (the reference's
  * parameterized-aggregate syntax `sequenceMatch('pat')(t, c1...)`
  * flattens to `sequenceMatch('pat', t, c1...)` through our SQL shim).
  */
trait SequenceAggLike extends BinaryLike[Expression] {
  self: TypedImperativeAggregate[SeqBuf] =>
  def tsExpr: Expression
  def bitsExpr: Expression
  def pattern: String
  def nFlags: Int

  @transient protected lazy val parsed: SequenceCore.Pattern =
    SequenceCore.parse(pattern, nFlags)

  override def left: Expression = tsExpr
  override def right: Expression = bitsExpr
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SeqBuf =
    new SeqBuf(new Array[Long](8), new Array[Long](8), 0)

  override def update(b: SeqBuf, input: InternalRow): SeqBuf = {
    val t = tsExpr.eval(input)
    val f = bitsExpr.eval(input)
    if (t != null && f != null) {
      val fb = f.asInstanceOf[Number].longValue()
      if (fb != 0L) b.add(t.asInstanceOf[Number].longValue(), fb)
    }
    b
  }

  override def merge(b: SeqBuf, other: SeqBuf): SeqBuf = {
    var i = 0
    while (i < other.n) { b.add(other.ts(i), other.bits(i)); i += 1 }
    b
  }

  override def serialize(b: SeqBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ts(i)); bb.putLong(b.bits(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SeqBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val cap = math.max(8, n)
    val ts = new Array[Long](cap)
    val bits = new Array[Long](cap)
    var i = 0
    while (i < n) { ts(i) = bb.getLong; bits(i) = bb.getLong; i += 1 }
    new SeqBuf(ts, bits, n)
  }
}

case class SequenceMatchAgg(
    tsExpr: Expression,
    bitsExpr: Expression,
    pattern: String,
    nFlags: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SeqBuf] with SequenceAggLike {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sequence_match"

  override def eval(b: SeqBuf): Any = {
    SequenceCore.sortPairs(b.ts, b.bits, b.n)
    SequenceCore.matches(parsed, b.ts, b.bits, b.n)
  }

  override def withNewMutableAggBufferOffset(n: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceMatchAgg =
    copy(tsExpr = newLeft, bitsExpr = newRight)
}

case class SequenceCountAgg(
    tsExpr: Expression,
    bitsExpr: Expression,
    pattern: String,
    nFlags: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SeqBuf] with SequenceAggLike {

  override def dataType: DataType = LongType
  override def prettyName: String = "sequence_count"

  override def eval(b: SeqBuf): Any = {
    SequenceCore.sortPairs(b.ts, b.bits, b.n)
    SequenceCore.count(parsed, b.ts, b.bits, b.n)
  }

  override def withNewMutableAggBufferOffset(n: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceCountAgg =
    copy(tsExpr = newLeft, bitsExpr = newRight)
}

object SequenceMatchAgg {
  /** Flag-bitset column from ordered event conditions (condition i →
    * bit i, pattern event `(?i+1)`).
    */
  def flagBits(conds: Seq[Column]): Column = {
    import org.apache.spark.sql.functions._
    conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ bitwiseOR _)
  }

  def sequenceMatch(pattern: String)(ts: Column, conds: Column*): Column =
    ColumnBridge.column(SequenceMatchAgg(
      ColumnBridge.expression(ts),
      ColumnBridge.expression(flagBits(conds)),
      pattern, conds.size).toAggregateExpression())

  def sequenceCount(pattern: String)(ts: Column, conds: Column*): Column =
    ColumnBridge.column(SequenceCountAgg(
      ColumnBridge.expression(ts),
      ColumnBridge.expression(flagBits(conds)),
      pattern, conds.size).toAggregateExpression())
}
