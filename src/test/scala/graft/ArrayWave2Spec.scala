package graft

/** Unit gates for the array long-tail spellings (reference
  * src/Functions/array/): hand cases from the reference docs plus the
  * scan/fill/split semantics.
  */
class ArrayWave2Spec extends SparkSpec {

  private def one(expr: String): Any = spark.sql(s"SELECT $expr").head.get(0)
  private def seqOf(expr: String): Seq[Any] =
    one(expr).asInstanceOf[scala.collection.Seq[Any]].toSeq

  test("arrayCount: predicate and non-zero forms") {
    assert(one("arrayCount(x -> x % 2 = 0, array(1, 2, 3, 4))") === 2)
    assert(one("arrayCount(array(0, 1, 2, 0, 3))") === 3)
  }

  test("arrayFirst/arrayLast values and indexes") {
    assert(one("arrayFirst(x -> x > 2, array(1, 2, 3, 4))") === 3)
    assert(one("arrayLast(x -> x > 2, array(1, 2, 3, 4))") === 4)
    // no match on a NON-Nullable element type = the type default
    // (reference arrayFirst.cpp insertDefault; 02161 golden)
    assert(one("arrayFirst(x -> x > 9, array(1, 2))") === 0)
    assert(one("arrayLast(x -> x > 9, array(1, 2))") === 0)
    assert(one("arrayFirstIndex(x -> x > 2, array(1, 2, 3, 4))") === 3)
    assert(one("arrayLastIndex(x -> x > 2, array(1, 2, 3, 4))") === 4)
    assert(one("arrayFirstIndex(x -> x > 9, array(1, 2))") === 0)
    assert(one("arrayLastIndex(x -> x > 9, array(1, 2))") === 0)
  }

  test("arrayFill / arrayReverseFill forward/backward scans") {
    // the reference-doc example: falsy positions take the predecessor
    assert(seqOf(
      "arrayFill(x -> NOT (x IS NULL), array(1, NULL, 3, 11, 12, NULL, NULL, 5, 3, NULL))") ===
      Seq(1, 1, 3, 11, 12, 12, 12, 5, 3, 3))
    assert(seqOf(
      "arrayReverseFill(x -> NOT (x IS NULL), array(NULL, 1, NULL, 3))") ===
      Seq(1, 1, 3, 3))
    // leading falsy element stays when there is no predecessor
    assert(seqOf("arrayFill(x -> x > 0, array(-1, 2, -3))") === Seq(-1, 2, 2))
  }

  test("arrayCumSumNonNegative clamps the running sum at zero") {
    assert(seqOf("arrayCumSumNonNegative(array(1, 1, -4, 1))") ===
      Seq(1.0, 2.0, 0.0, 1.0))
  }

  test("arrayEnumerateDense assigns first-occurrence dense ids") {
    assert(seqOf("arrayEnumerateDense(array(10, 20, 10, 30))") === Seq(1, 2, 1, 3))
  }

  test("arrayUnion distinct-merges preserving first-seen order") {
    assert(seqOf("arrayUnion(array(1, 2), array(2, 3), array(3, 4))") ===
      Seq(1, 2, 3, 4))
  }

  test("hasSubstr checks contiguous subsequences") {
    assert(one("hasSubstr(array(1, 2, 3, 4), array(2, 3))") === true)
    assert(one("hasSubstr(array(1, 2, 3, 4), array(3, 2))") === false)
    assert(one("hasSubstr(array(1, 2), array())") === true)
    assert(one("hasSubstr(array(1), array(1, 2))") === false)
  }

  test("emptyArrayToSingle pads empties to one element") {
    assert(seqOf("emptyArrayToSingle(array(7, 8))") === Seq(7, 8))
    assert(seqOf("CAST(emptyArrayToSingle(CAST(array() AS ARRAY<INT>)) AS ARRAY<INT>)") ===
      Seq(null))
  }

  test("arraySplit / arrayReverseSplit segment at the predicate") {
    assert(seqOf("arraySplit(x -> x = 1, array(0, 1, 0, 1, 1, 0))") ===
      Seq(Seq(0), Seq(1, 0), Seq(1), Seq(1, 0)))
    assert(seqOf("arrayReverseSplit(x -> x = 1, array(0, 1, 0, 1, 1, 0))") ===
      Seq(Seq(0, 1), Seq(0, 1), Seq(1), Seq(0)))
    // a TRUE first element does not open an extra empty group
    assert(seqOf("arraySplit(x -> x > 0, array(5, 1, 2))") ===
      Seq(Seq(5), Seq(1), Seq(2)))
    assert(seqOf("CAST(arraySplit(x -> x = 1, CAST(array() AS ARRAY<INT>)) AS ARRAY<ARRAY<INT>>)") ===
      Seq())
  }

  test("emptyArray constructors are typed zero-length arrays") {
    assert(seqOf("emptyArrayInt32()") === Seq())
    assert(one("size(emptyArrayString())") === 0)
    assert(one("typeof(emptyArrayFloat64())") === "array<double>")
    assert(one("typeof(emptyArrayDate())") === "array<date>")
  }

  test("arrayPartialSort refines the unspecified tail to a total sort") {
    assert(seqOf("arrayPartialSort(2, array(5, 1, 4, 3))") === Seq(1, 3, 4, 5))
    assert(seqOf("arrayPartialReverseSort(2, array(5, 1, 4, 3))") === Seq(5, 4, 3, 1))
  }

  test("aggThrow: p=0 aggregates to the UInt8 default, p>0 throws") {
    assert(spark.sql(
      "SELECT aggThrow(0.0) AS v FROM VALUES (1), (2) t(x)").head.get(0) === 0)
    val e = intercept[Exception] {
      spark.sql("SELECT aggThrow(1.0) FROM VALUES (1) t(x)").collect()
    }
    assert(e.getMessage.contains("thrown exception successfully") ||
      Option(e.getCause).exists(_.getMessage.contains("thrown exception successfully")))
  }

  test("arrayAUC matches the reference doc example") {
    val got = one("arrayAUC(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1))")
      .asInstanceOf[Double]
    assert(math.abs(got - 0.75) < 1e-12)
  }

  test("arrayShuffle is a seeded deterministic permutation") {
    val a = seqOf("arrayShuffle(array(1.0, 2.0, 3.0, 4.0, 5.0), 42)")
    val b = seqOf("arrayShuffle(array(1.0, 2.0, 3.0, 4.0, 5.0), 42)")
    assert(a === b)
    assert(a.map(_.asInstanceOf[Double]).sorted === Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }
}
