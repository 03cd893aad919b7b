package graft

/** Unit gates for the wave-11 scalars: base58 (no DuckDB counterpart),
  * ngram metric edge cases, and the versionCompare default/trailing-dot
  * quirks from FunctionAppVersionCompare.h.
  */
class Wave11ScalarSpec extends SparkSpec {

  private def one(expr: String): Any =
    spark.sql(s"SELECT $expr").head.get(0)

  test("base58 known vectors and round-trip") {
    // public test vectors (Bitcoin alphabet)
    assert(one("base58Encode('hello')") === "Cn8eVZg")
    assert(one("base58Decode('Cn8eVZg')") === "hello")
    assert(one("base58Encode('')") === "")
    assert(one("base58Decode(base58Encode('The quick brown fox'))") ===
      "The quick brown fox")
  }

  test("ngramDistance identical strings are 0, disjoint are 1") {
    assert(one("ngramDistance('spark engine', 'spark engine')") === 0f)
    assert(one("ngramDistance('aaaaaa', 'zzzzzz')") === 1f)
    // short strings (<4 bytes) have no grams: distance s/max(s,1) with
    // s=0,h=0 → 0/1 = 0
    assert(one("ngramDistance('ab', 'cd')") === 0f)
  }

  test("ngramSearch finds a contained needle with similarity 1") {
    assert(one("ngramSearch('clickhouse engine', 'house')") === 1f)
    assert(one("ngramSearchCaseInsensitive('CLICKHOUSE', 'house')") === 1f)
    val partial = one("ngramSearch('clickhouse', 'mousepad')")
      .asInstanceOf[Float]
    assert(partial > 0f && partial < 1f)
  }

  test("versionCompare segment semantics") {
    assert(one("versionCompare('1.2.3', '1.2.3', '=')") === true)
    assert(one("versionCompare('1.10', '1.9', '>')") === true)
    // missing segments read 0: 1.2 vs 1.2.0 are equal
    assert(one("versionCompare('1.2', '1.2.0', '=')") === true)
    // non-numeric tails are skipped to the next dot: 1.2abc == 1.2
    assert(one("versionCompare('1.2abc', '1.2', '=')") === true)
  }

  test("appVersionCompare dot-presence and trailing-dot quirks") {
    // one side has a dot, the other doesn't → false outright
    assert(one("appVersionCompare('6.4', '64', '=')") === false)
    // 6.4 vs 6.4.0 → -2 vs 0 → not equal (reference example 1)
    assert(one("appVersionCompare('6.4', '6.4.0', '=')") === false)
    assert(one("appVersionCompare('6.4', '6.4.0', '<')") === true)
    // 6.4 vs 6.4. → -2 vs -1 → less (reference example 2)
    assert(one("appVersionCompare('6.4', '6.4.', '<')") === true)
    assert(one("appVersionCompare('6.4.1', '6.4.1', '=')") === true)
  }

  test("bitmaskToList/bitmaskToArray decompose ascending") {
    assert(one("bitmaskToList(50)") === "2,16,32")
    assert(one("bitmaskToArray(50)").asInstanceOf[scala.collection.Seq[Long]] ===
      Seq(2L, 16L, 32L))
    assert(one("bitmaskToList(0)") === "")
  }

  test("quarter arithmetic and milli timestamps") {
    assert(one("CAST(addQuarters(DATE '2024-01-31', 2) AS STRING)") === "2024-07-31")
    assert(one("CAST(subtractQuarters(DATE '2024-01-31', 1) AS STRING)") === "2023-10-31")
    assert(one("CAST(fromUnixTimestampMilli(1704067200123) AS STRING)")
      .toString.startsWith("2024-01-01 00:00:00.123"))
  }
}
