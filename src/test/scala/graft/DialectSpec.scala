package graft

import org.apache.spark.sql.Row

/** ClickHouse-dialect function aliases resolve through the session's
  * FunctionRegistry and compute the reference semantics.
  */
class DialectSpec extends SparkSpec {
  import spark.implicits._

  private def one(sql: String): Row = spark.sql(sql).collect()(0)

  test("conditional aggregate combinators (-If family)") {
    Seq((1, 10.0, true), (2, 20.0, false), (3, 30.0, true))
      .toDF("id", "v", "flag").createOrReplaceTempView("t")
    val r = one("""SELECT countIf(flag), sumIf(v, flag), avgIf(v, flag),
                   minIf(v, flag), maxIf(v, flag) FROM t""")
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 40.0)
    assert(r.getDouble(2) === 20.0)
    assert(r.getDouble(3) === 10.0)
    assert(r.getDouble(4) === 30.0)
  }

  test("date helpers and conversions") {
    val r = one("""SELECT toYYYYMM(TIMESTAMP '2024-03-15 10:30:00'),
                   toStartOfDay(TIMESTAMP '2024-03-15 10:30:00'),
                   toYear(TIMESTAMP '2024-03-15 10:30:00'),
                   toInt64('42'), toFloat64('2.5')""")
    assert(r.getInt(0) === 202403)
    assert(r.getTimestamp(1).toString === "2024-03-15 00:00:00.0")
    assert(r.getInt(2) === 2024)
    assert(r.getLong(3) === 42L)
    assert(r.getDouble(4) === 2.5)
  }

  test("string and array families") {
    val r = one("""SELECT splitByChar(',', 'a,b,c'),
                   length('hello w') + 4,
                   countSubstrings('abcabcabc', 'abc'),
                   has(array(1, 2, 3), 2),
                   arraySort(array(3, 1, 2)),
                   multiIf(1 > 2, 'x', 3 > 2, 'y', 'z'),
                   empty(''), notEmpty('q')""")
    assert(r.getSeq[String](0) === Seq("a", "b", "c"))
    assert(r.getInt(1) === 11)
    assert(r.getInt(2) === 3)
    assert(r.getBoolean(3))
    assert(r.getSeq[Int](4) === Seq(1, 2, 3))
    assert(r.getString(5) === "y")
    assert(r.getBoolean(6))
    assert(r.getBoolean(7))
  }

  test("uniq / any / argMax aggregates and arrayJoin generator") {
    Seq((1, "a"), (1, "b"), (2, "c"), (2, "c")).toDF("k", "s")
      .createOrReplaceTempView("u")
    val r = one("SELECT uniq(s), groupUniqArray(s) FROM u")
    assert(r.getLong(0) === 3L)
    assert(r.getSeq[String](1).sorted === Seq("a", "b", "c"))
    val aj = spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS x").collect().map(_.getInt(0))
    assert(aj.toSeq === Seq(1, 2, 3))
    Seq((1, 5.0, "p"), (2, 9.0, "q"), (3, 7.0, "r")).toDF("id", "score", "nm")
      .createOrReplaceTempView("am")
    assert(one("SELECT argMax(nm, score) FROM am").getString(0) === "q")
  }

  test("JSON extraction aliases") {
    Seq(Tuple1("""{"k": 7, "s": "hi"}""")).toDF("j").createOrReplaceTempView("js")
    val r = one("""SELECT JSONExtractInt(j, 'k'), JSONExtractString(j, 's'),
                   JSONHas(j, 'k'), JSONHas(j, 'missing') FROM js""")
    assert(r.getLong(0) === 7L)
    assert(r.getString(1) === "hi")
    assert(r.getBoolean(2))
    assert(!r.getBoolean(3))
  }

  test("splitByChar treats regex metacharacters as literals") {
    val r = one("""SELECT splitByChar('.', '10.1.2.3'), splitByChar('|', 'a|b')""")
    assert(r.getSeq[String](0) === Seq("10", "1", "2", "3"))
    assert(r.getSeq[String](1) === Seq("a", "b"))
  }

  test("toDayOfWeek is Monday=1 (ClickHouse convention)") {
    // 2024-03-15 is a Friday; 2024-03-17 a Sunday
    val r = one("""SELECT toDayOfWeek(TIMESTAMP '2024-03-15 00:00:00'),
                   toDayOfWeek(TIMESTAMP '2024-03-17 00:00:00')""")
    assert(r.getInt(0) === 5)
    assert(r.getInt(1) === 7)
  }

  test("range is empty for n <= 0 and end-exclusive") {
    val r = one("SELECT range(0), range(3), range(2, 5), range(5, 5)")
    assert(r.getSeq[Long](0) === Seq.empty)
    assert(r.getSeq[Long](1) === Seq(0L, 1L, 2L))
    assert(r.getSeq[Long](2) === Seq(2L, 3L, 4L))
    assert(r.getSeq[Long](3) === Seq.empty)
  }

  test("math and misc") {
    val r = one("""SELECT intDiv(17, 5), modulo(17, 5), divide(1, 4),
                   mid('abcdef', 2, 3), range(3)""")
    assert(r.getLong(0) === 3L)
    assert(r.getInt(1) === 2)
    assert(r.getDouble(2) === 0.25)
    assert(r.getString(3) === "bcd")
    assert(r.getSeq[Int](4) === Seq(0, 1, 2))
  }
}
