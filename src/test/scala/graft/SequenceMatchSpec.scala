package graft

import graft.aggregates.{SequenceCore, SequenceMatchAgg}
import org.apache.spark.sql.functions._

/** Differential gate for the sequenceMatch pattern DSL: an independent
  * naive recursive matcher (exponential, spec-derived from
  * AggregateFunctionSequenceMatch.h's action semantics) is compared with
  * the real engine across random event lists — multi-flag rows, duplicate
  * timestamps, both the DFA and backtracking paths.
  */
class SequenceMatchSpec extends SparkSpec {
  import SequenceCore._
  import spark.implicits._

  /** Naive matcher: nondeterministic-choice semantics of the action list.
    * Time ops pick any later row satisfying the comparison against the
    * base row (valid because rows are ts-sorted); Kleene picks any skip.
    */
  private def naiveMatch(p: Pattern, ts: Array[Long], bits: Array[Long]): Boolean = {
    val n = ts.length
    val ops = p.ops
    val ex = p.extras
    def skippable(ai: Int): Boolean = ops(ai) match {
      case KleeneStar | TimeLessOrEqual | TimeLess => true
      case TimeGreaterOrEqual => ex(ai) == 0L
      case _ => false
    }
    def rec(ai: Int, i: Int, base: Int): Boolean = {
      if (ai == ops.length) true
      else if (i >= n) (ai until ops.length).forall(skippable)
      else ops(ai) match {
        case SpecificEvent =>
          ((bits(i) >>> ex(ai).toInt) & 1L) == 1L && rec(ai + 1, i + 1, i)
        case AnyEvent => rec(ai + 1, i + 1, i)
        case KleeneStar => (i to n).exists(j => rec(ai + 1, j, if (j < n) j else base))
        case op =>
          (i until n).exists { j =>
            val lim = ts(base) + ex(ai)
            val ok = op match {
              case TimeLessOrEqual => ts(j) <= lim
              case TimeLess => ts(j) < lim
              case TimeGreaterOrEqual => ts(j) >= lim
              case TimeGreater => ts(j) > lim
              case TimeEqual => ts(j) == lim
            }
            ok && rec(ai + 1, j, j)
          }
      }
    }
    rec(0, 0, 0)
  }

  /** Independent greedy count for '(?1)(?2)': earliest adjacent
    * flag1→flag2 pair from the cursor, then resume past it.
    */
  private def greedyCountAdj(ts: Array[Long], bits: Array[Long]): Long = {
    val n = ts.length
    var i = 0; var c = 0L
    while (i + 1 < n) {
      if ((bits(i) & 1L) == 1L && (bits(i + 1) & 2L) == 2L) { c += 1; i += 2 }
      else i += 1
    }
    c
  }

  /** Independent greedy count for '(?1)(?t<=d)(?2)': earliest flag1 row
    * (from cursor) that has a flag2 row after it within d; consume
    * through that flag2 row.
    */
  private def greedyCountTimeLE(d: Long, ts: Array[Long], bits: Array[Long]): Long = {
    val n = ts.length
    var cursor = 0; var c = 0L; var go = true
    while (go) {
      var found = -1
      var s = cursor
      while (found < 0 && s < n) {
        if ((bits(s) & 1L) == 1L) {
          var j = s + 1
          while (found < 0 && j < n && ts(j) <= ts(s) + d) {
            if ((bits(j) & 2L) == 2L) found = j
            j += 1
          }
        }
        s += 1
      }
      if (found >= 0) { c += 1; cursor = found + 1 } else go = false
    }
    c
  }

  private val patterns3 = Seq(
    "(?1)(?2)", "(?1).*(?2)", "(?2).*(?1)", "(?1).(?2)", "(?1)(?2)(?3)",
    "(?1).*(?2).*(?3)", ".*(?3)", "(?3)", ".(?2)",
    "(?1)(?t<=3)(?2)", "(?1)(?t<3)(?2)", "(?1)(?t>=3)(?2)", "(?1)(?t>3)(?2)",
    "(?1)(?t==2)(?2)", "(?1)(?t<=4)(?2)(?t<=4)(?3)", "(?1)(?t>=1)(?2).*(?3)",
    "(?1).*(?t<=6)(?2)", "(?1)(?t>=0)(?2)", "(?1)(?t<=100)(?2)",
    "(?t<=3)(?1)(?2)")

  test("differential: engine vs naive matcher on 400 random lists x 20 patterns") {
    val rnd = new scala.util.Random(20240812)
    val parsedAll = patterns3.map(p => p -> parse(p, 3))
    var checked = 0
    (1 to 400).foreach { _ =>
      val n = rnd.nextInt(9)
      val ts = Array.fill(n)(rnd.nextInt(13).toLong).sorted
      val bits = Array.fill(n)((rnd.nextInt(7) + 1).toLong) // 3 flags, multi-flag rows
      SequenceCore.sortPairs(ts, bits, n)
      parsedAll.foreach { case (str, p) =>
        val expected = naiveMatch(p, ts, bits)
        val got = matches(p, ts, bits, n)
        assert(got === expected,
          s"pattern $str on ts=${ts.mkString(",")} bits=${bits.mkString(",")}")
        // the count path always uses backtracking — its first-match must
        // agree with the match verdict regardless of the DFA fast path
        val viaBt = backtrackingMatch(p, ts, bits, 0, n)._1
        assert(viaBt === expected, s"backtracking disagrees for $str")
        val cnt = count(p, ts, bits, n)
        assert((cnt > 0) === expected, s"count>0 vs match for $str")
        checked += 1
      }
    }
    assert(checked === 400 * patterns3.size)
  }

  test("differential: greedy sequenceCount vs independent naive counters") {
    val rnd = new scala.util.Random(777)
    val pAdj = parse("(?1)(?2)", 2)
    val pTime = parse("(?1)(?t<=3)(?2)", 2)
    (1 to 600).foreach { _ =>
      val n = rnd.nextInt(10)
      val ts = Array.fill(n)(rnd.nextInt(12).toLong).sorted
      val bits = Array.fill(n)((rnd.nextInt(3) + 1).toLong) // flags 1/2, multi-flag
      SequenceCore.sortPairs(ts, bits, n)
      assert(count(pAdj, ts, bits, n) === greedyCountAdj(ts, bits),
        s"adj count on ts=${ts.mkString(",")} bits=${bits.mkString(",")}")
      assert(count(pTime, ts, bits, n) === greedyCountTimeLE(3L, ts, bits),
        s"timeLE count on ts=${ts.mkString(",")} bits=${bits.mkString(",")}")
    }
  }

  test("hand-picked reference semantics") {
    def run(pat: String, nf: Int, rows: (Long, Long)*): Boolean = {
      val ts = rows.map(_._1).toArray
      val bits = rows.map(_._2).toArray
      SequenceCore.sortPairs(ts, bits, ts.length)
      matches(parse(pat, nf), ts, bits, ts.length)
    }
    // trailing time condition matches the empty tail
    assert(run("(?1)(?t<=5)", 1, (0L, 1L)))
    // ... but an unsatisfiable inner time condition does not
    assert(!run("(?1)(?t<=5)(?2)", 2, (0L, 1L), (100L, 2L)))
    // adjacency is positional in the filtered list
    assert(run("(?1)(?2)", 2, (5L, 1L), (9L, 2L)))
    assert(!run("(?1)(?2)", 2, (5L, 2L), (9L, 1L)))
    // a row carrying only a third flag still enters the list and breaks
    // adjacency between flag1 and flag2
    assert(run("(?1)(?2)", 3, (0L, 1L), (9L, 2L)))
    assert(!run("(?1)(?2)", 3, (0L, 1L), (5L, 4L), (9L, 2L)))
    // empty list: '.*' matches, '(?1)' doesn't
    assert(run(".*", 1))
    assert(!run("(?1)", 1))
    // time-greater skips too-early rows instead of failing
    assert(run("(?1)(?t>=10)(?2)", 2, (0L, 1L), (3L, 2L), (15L, 2L)))
    // kleene-then-time: base re-anchors at the kleene position
    assert(run("(?1).*(?t<=1)(?2)", 2, (0L, 1L), (100L, 2L)))
    // equal timestamps order by flag-bits (deterministic tie-break)
    assert(run("(?1)(?2)", 2, (5L, 2L), (5L, 1L)))
  }

  test("pattern parser rejects malformed patterns") {
    assert(intercept[IllegalArgumentException](parse("(?4)", 3))
      .getMessage.contains("out of range"))
    assert(intercept[IllegalArgumentException](parse("(?x)", 3))
      .getMessage.contains("could not parse number"))
    assert(intercept[IllegalArgumentException](parse("abc", 3))
      .getMessage.contains("unexpected symbol"))
    assert(intercept[IllegalArgumentException](parse("(?1", 3))
      .getMessage.contains("closing parenthesis"))
    assert(intercept[IllegalArgumentException](parse("(?t~5)(?1)", 3))
      .getMessage.contains("unknown time condition"))
    assert(intercept[IllegalArgumentException](parse("(?1)(?t<=3)(?t<=4)(?2)", 3))
      .getMessage.contains("preceded"))
  }

  test("DataFrame aggregate: partial merge across partitions, match and count") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"), (1L, 40L, "b"),
      (2L, 10L, "b"), (2L, 20L, "a"),
      (3L, 10L, "a"), (3L, 500L, "b")
    ).toDF("u", "us", "t")
    val m = df.repartition(4) // force serialize/merge paths
      .groupBy($"u")
      .agg(
        SequenceMatchAgg.sequenceMatch("(?1)(?t<=15)(?2)")($"us", $"t" === "a", $"t" === "b").as("m"),
        SequenceMatchAgg.sequenceCount("(?1)(?2)")($"us", $"t" === "a", $"t" === "b").as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(m(1L) === ((true, 2L)))  // two adjacent a→b pairs
    assert(m(2L) === ((false, 0L))) // b before a
    assert(m(3L) === ((false, 1L))) // adjacency yes, 15-tick window no
  }

  test("SQL shim: sequenceMatch / sequenceCount flattened parameterized form") {
    val r = spark.sql("""
      SELECT u,
        sequenceMatch('(?1)(?t<=15)(?2)', us, t = 'a', t = 'b') AS m,
        sequenceCount('(?1)(?2)', us, t = 'a', t = 'b') AS c
      FROM VALUES (1, 10, 'a'), (1, 20, 'b'), (2, 10, 'b'), (2, 400, 'a') AS v(u, us, t)
      GROUP BY u ORDER BY u""").collect()
    assert(r(0).getBoolean(1) === true)
    assert(r(0).getLong(2) === 1L)
    assert(r(1).getBoolean(1) === false)
    assert(r(1).getLong(2) === 0L)
  }
}
