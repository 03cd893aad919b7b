package graft.aggregates

import scala.collection.mutable

import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Bitmap expression calculation: segment algebra over per-tag user-set
  * bitmaps (reference /root/reference/src/AggregateFunctions/
  * AggregateFunctionBitmapExpressionCalculation.h — `bitmapCount('A&B~C')
  * (tag, bitmap)` unions each tag's bitmaps, then evaluates the expression
  * string; BitMapExpressionAnalyzerImpl in
  * AggregateBitmapExpressionCommon.h:343 tokenizes keys and the operators
  * `&` (and), `|`/`,` (or), `~` (andnot) with parentheses, all one
  * precedence level, left-associative).
  *
  * Spark-first shape: the aggregate ingests (tag, value) rows directly —
  * tags NOT mentioned in the expression are dropped at update time, so
  * the partial state carries only the segments the expression needs; the
  * shuffle then moves one pruned tag→bitmap map per partition
  * (Roaring-compressed), and the expression evaluates once at finish.
  */
object BitmapExprParser {

  sealed trait Node
  final case class Key(k: String) extends Node
  final case class Op(op: Char, l: Node, r: Node) extends Node

  /** Tokens: `( ) & | , ~`; spaces separate; anything else is a key
    * character (the reference accepts integer and string tags alike).
    */
  def parse(s: String): Node = {
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i) == ' ') i += 1
    def isOp(c: Char) = c == '&' || c == '|' || c == ',' || c == '~'
    def isDelim(c: Char) = isOp(c) || c == '(' || c == ')' || c == ' '
    def term(): Node = {
      skipWs()
      require(i < n, s"bitmap expression ends mid-term: '$s'")
      if (s.charAt(i) == '(') {
        i += 1
        val e = expr()
        skipWs()
        require(i < n && s.charAt(i) == ')', s"unbalanced '(' in '$s'")
        i += 1
        e
      } else {
        val start = i
        while (i < n && !isDelim(s.charAt(i))) i += 1
        require(i > start, s"expected key at offset $start in '$s'")
        Key(s.substring(start, i))
      }
    }
    def expr(): Node = {
      var left = term()
      skipWs()
      while (i < n && isOp(s.charAt(i))) {
        val op = s.charAt(i)
        i += 1
        left = Op(if (op == ',') '|' else op, left, term())
        skipWs()
      }
      left
    }
    val root = expr()
    skipWs()
    require(i == n, s"trailing input at offset $i in '$s'")
    root
  }

  def keys(node: Node): Set[String] = node match {
    case Key(k) => Set(k)
    case Op(_, l, r) => keys(l) ++ keys(r)
  }

  def eval(node: Node, m: collection.Map[String, Roaring64NavigableMap]): Roaring64NavigableMap =
    node match {
      case Key(k) =>
        val out = new Roaring64NavigableMap()
        m.get(k).foreach(out.or)
        out
      case Op(op, l, r) =>
        val a = eval(l, m)
        val b = eval(r, m)
        op match {
          case '&' => a.and(b)
          case '|' => a.or(b)
          case '~' => a.andNot(b)
        }
        a
    }
}

final case class BitmapTagInput(tag: String, value: Long)

/** tag→bitmap partial state; merge unions per key. */
final class BitmapExprState extends Serializable {
  val m: mutable.HashMap[String, Roaring64NavigableMap] = mutable.HashMap.empty
  def add(tag: String, v: Long): Unit =
    m.getOrElseUpdate(tag, new Roaring64NavigableMap()).addLong(v)
  def mergeFrom(o: BitmapExprState): Unit =
    o.m.foreach { case (k, bm) =>
      m.getOrElseUpdate(k, new Roaring64NavigableMap()).or(bm)
    }
}

sealed abstract class BitmapExprBase[OUT](expressions: Seq[String])
    extends Aggregator[BitmapTagInput, BitmapExprState, OUT] with Serializable {
  @transient protected lazy val asts: Seq[BitmapExprParser.Node] =
    expressions.map(BitmapExprParser.parse)
  @transient private lazy val wanted: Set[String] =
    asts.flatMap(BitmapExprParser.keys).toSet
  def zero: BitmapExprState = new BitmapExprState
  def reduce(b: BitmapExprState, in: BitmapTagInput): BitmapExprState = {
    if (in.tag != null && wanted.contains(in.tag)) b.add(in.tag, in.value)
    b
  }
  def merge(a: BitmapExprState, b: BitmapExprState): BitmapExprState = {
    a.mergeFrom(b)
    a
  }
  def bufferEncoder: Encoder[BitmapExprState] = Encoders.kryo
}

/** bitmapCountExpression: cardinality of the evaluated segment. */
final class BitmapExprCount(expression: String)
    extends BitmapExprBase[Long](Seq(expression)) {
  def finish(b: BitmapExprState): Long =
    BitmapExprParser.eval(asts.head, b.m).getLongCardinality
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** bitmapMultiCountExpression: one shared tag→bitmap state, N expression
  * cardinalities (reference AggregateFunctionBitMapMultiCount).
  */
final class BitmapExprMultiCount(expressions: Seq[String])
    extends BitmapExprBase[Seq[Long]](expressions) {
  def finish(b: BitmapExprState): Seq[Long] =
    asts.map(a => BitmapExprParser.eval(a, b.m).getLongCardinality)
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoders.seqLong
}

/** bitmapExtractExpression: the segment's members, ascending. */
final class BitmapExprExtract(expression: String)
    extends BitmapExprBase[Seq[Long]](Seq(expression)) {
  def finish(b: BitmapExprState): Seq[Long] = {
    val bm = BitmapExprParser.eval(asts.head, b.m)
    val out = new Array[Long](bm.getLongCardinality.toInt)
    val it = bm.getLongIterator
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out.toSeq
  }
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoders.seqLong
}

object BitmapExpr {
  private val in = Encoders.product[BitmapTagInput]
  def count(expression: String): UserDefinedFunction =
    udaf(new BitmapExprCount(expression), in)
  def multiCount(expressions: String*): UserDefinedFunction =
    udaf(new BitmapExprMultiCount(expressions), in)
  def extract(expression: String): UserDefinedFunction =
    udaf(new BitmapExprExtract(expression), in)
}
