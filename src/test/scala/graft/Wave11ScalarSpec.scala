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

  test("simHash family: determinism, case-invariance, similarity structure") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val r = spark.sql("""
      SELECT ngramSimHash('the quick brown fox jumps over the lazy dog') AS a,
             ngramSimHash('the quick brown fox jumps over the lazy dog') AS a2,
             ngramSimHash('the quick brown fox jumps over the lazy cat') AS b,
             ngramSimHash('completely unrelated content 12345 zyxw') AS c,
             ngramSimHashCaseInsensitive('HELLO WORLD TEXT') AS ci1,
             ngramSimHashCaseInsensitive('hello world text') AS ci2,
             wordShingleSimHash('alpha beta gamma delta epsilon zeta') AS w1,
             wordShingleSimHash('alpha beta gamma delta epsilon zeta') AS w2""").head
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(4) === r.getLong(5))
    assert(r.getLong(6) === r.getLong(7))
    // near-duplicate strings land close in Hamming space, unrelated far
    val near = hamming(r.getLong(0), r.getLong(2))
    val far = hamming(r.getLong(0), r.getLong(3))
    assert(near < far, s"near=$near far=$far")
  }

  test("minHash family: tuple equality and overlap behavior") {
    val r = spark.sql("""
      SELECT ngramMinHash('minhash shingle test string content') AS a,
             ngramMinHash('minhash shingle test string content') AS a2,
             ngramMinHash('minhash shingle test string content', 3, 6) AS a3,
             ngramMinHash('totally different words entirely here') AS b,
             wordShingleMinHash('longword shingles overlap testing material') AS w""").head
    val a = r.getStruct(0)
    assert(a === r.getStruct(1))
    assert(a === r.getStruct(2)) // explicit defaults match implicit
    assert(a !== r.getStruct(3))
    assert(r.getStruct(4).getLong(0) !== 0L)
  }

  test("minHashArg family: shingles behind the two minhash sides") {
    // differential vs the same FNV the scalar uses: k smallest hashes
    // descending on the min side, k largest ascending on the max side
    val s = "abcdef"
    val shingles = (0 to s.length - 3).map(i => s.substring(i, i + 3))
    val byHash = shingles.distinct.sortBy(sh =>
      graft.functions.SimilarityOps.fnv1a64(sh, false))(
      Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0))
    val r = spark.sql(s"SELECT ngramMinHashArg('$s', 3, 2) AS t").head.getStruct(0)
    val mins = r.getStruct(0)
    val maxs = r.getStruct(1)
    assert(Seq(mins.getString(0), mins.getString(1)) ===
      byHash.take(2).reverse)
    assert(Seq(maxs.getString(0), maxs.getString(1)) === byHash.takeRight(2))
    // short input pads trailing tuple fields with ''
    val p = spark.sql("SELECT ngramMinHashArg('ab', 3, 3) AS t").head
      .getStruct(0).getStruct(0)
    assert((0 until 3).map(p.getString) === Seq("ab", "", ""))
    // CI variant stores the lowered shingle
    val c = spark.sql("SELECT ngramMinHashArgCaseInsensitive('ABCD', 3, 6) AS t")
      .head.getStruct(0).getStruct(0)
    assert((0 until 6).map(c.getString).filter(_.nonEmpty).toSet === Set("abc", "bcd"))
    // wordShingle spelling resolves and returns words of the input
    val w = spark.sql(
      "SELECT wordShingleMinHashArg('alpha beta gamma delta epsilon', 2, 2) AS t")
      .head.getStruct(0).getStruct(1)
    assert(w.getString(0).split(" ").forall(
      Set("alpha", "beta", "gamma", "delta", "epsilon")))
  }

  test("detect* heuristics: language, charset, tonality, programming") {
    assert(one("detectLanguage('the cat and the dog of a house')") === "en")
    assert(one("detectLanguage('der Hund und die Katze ist da')") === "de")
    assert(one("detectLanguage('你好世界你好世界')") === "zh")
    assert(one("detectLanguage('xyzzy qwerty')") === "un")
    assert(one("detectCharset('plain ascii')") === "US-ASCII")
    assert(one("detectCharset('héllo wörld')") === "UTF-8")
    assert(one("detectTonality('good great love')").asInstanceOf[Float] > 0f)
    assert(one("detectTonality('bad terrible hate')").asInstanceOf[Float] < 0f)
    assert(one("detectProgrammingLanguage('def foo(self): import os')") === "Python")
    assert(one("detectProgrammingLanguage('select x from t where y')") === "SQL")
    assert(one("map_keys(detectLanguageMixed('the cat and the dog'))") ===
      Seq("en"))
  }

  test("coding wave: CRC variants, UUID coding, unbin, FQDN") {
    // zlib crc32("hello") — the standard vector Spark's builtin matches
    assert(one("CRC32('hello')") === 0x3610a686L)
    // the init-0 IEEE variant and CRC64/ECMA differ from zlib and are
    // deterministic
    assert(one("CRC32IEEE('hello')") !== 0x3610a686L)
    assert(one("CRC32IEEE('hello')") === one("CRC32IEEE('hello')"))
    assert(one("CRC64('hello')") !== one("CRC64('hellp')"))
    val uuid = "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    assert(one(s"UUIDNumToString(UUIDStringToNum('$uuid'))") === uuid)
    assert(one(s"UUIDNumToString(UUIDStringToNum('$uuid', 2), 2)") === uuid)
    // variant-2 layout swaps the first three groups
    assert(one(s"hex(UUIDStringToNum('$uuid', 2))").toString.toLowerCase
      .startsWith("04c4f061"))
    assert(one(s"UUIDToUInt64High('$uuid')") === 0x61f0c4045cb311e7L)
    assert(one("unbin('0110000101100010')") === "ab")
    assert(one("unbin('1100001')") === "a") // left-padded to whole bytes
    assert(one("length(FQDN()) > 0") === true)
  }

  test("SQL/JSON trio behaviors") {
    assert(one("""JSON_VALUE('{"a":"x"}', '$.a')""") === "x")
    assert(one("""JSON_VALUE('{"a":{"b":1}}', '$.a')""") === "")
    assert(one("""JSON_VALUE('{"a":1}', '$.missing')""") === "")
    assert(one("""JSON_EXISTS('{"a":1}', '$.a')""") === 1)
    assert(one("""JSON_EXISTS('{"a":1}', '$.b')""") === 0)
    assert(one("""JSON_QUERY('{"a":"x"}', '$.a')""") === "[\"x\"]")
    assert(one("""JSON_QUERY('{"a":{"b":1}}', '$.a')""") === "[{\"b\":1}]")
    assert(one("""JSON_QUERY('{"a":1}', '$.missing')""") === "")
  }

  test("quarter arithmetic and milli timestamps") {
    assert(one("CAST(addQuarters(DATE '2024-01-31', 2) AS STRING)") === "2024-07-31")
    assert(one("CAST(subtractQuarters(DATE '2024-01-31', 1) AS STRING)") === "2023-10-31")
    // DateTime result: the milli remainder truncates (pinned by the
    // reference's own 01277_fromUnixTimestampMilli golden output)
    assert(one("CAST(fromUnixTimestampMilli(1704067200123) AS STRING)")
      .toString.startsWith("2024-01-01 00:00:00"))
  }
}
