package graft

import org.apache.spark.sql.Row

/** Unit gates for the attribution fuse aggregates: paths the oracle
  * query can't pin — top-N-by-value trimming with the
  * '$other_conversions' carve-out, the empty-sample [0] distribution,
  * and the Spearman edge cases.
  */
class AttributionFuseSpec extends SparkSpec {

  private def tup(ev: String, attr: String, clicks: Long, valid: Long,
      times: Seq[Long], steps: Seq[Long], value: Double): String =
    s"""named_struct(
      'touch_events', array(array('$ev', '$attr')),
      'click_cnt', array(CAST($clicks AS BIGINT)),
      'valid_transform_cnt', array(CAST($valid AS BIGINT)),
      'transform_times', array(array(${times.map(t => s"CAST($t AS BIGINT)").mkString(",")})),
      'transform_steps', array(array(${steps.map(t => s"CAST($t AS BIGINT)").mkString(",")})),
      'value', array(CAST($value AS DOUBLE)),
      'contribution', array(CAST(0.0 AS DOUBLE)))"""

  private def fuse(call: String, tuples: Seq[String]): Row = {
    val sql = tuples.map(t => s"SELECT $t AS tup").mkString(" UNION ALL ")
    spark.sql(s"WITH t AS ($sql) SELECT $call FROM t").head.getStruct(0)
  }

  test("top-N by value keeps the largest and preserves key order") {
    val r = fuse("attributionAnalysisFuse(2, tup)", Seq(
      tup("a", "x", 1, 1, Seq(5), Seq(1), 10.0),
      tup("b", "x", 1, 1, Seq(5), Seq(1), 30.0),
      tup("c", "x", 1, 1, Seq(5), Seq(1), 20.0)))
    val keys = r.getSeq[scala.collection.Seq[String]](0).map(_.head)
    assert(keys === Seq("b", "c"))
    assert(r.getSeq[Double](6) === Seq(30.0, 20.0))
  }

  test("need_others keeps $other_conversions outside the top-N budget") {
    val r = fuse("attributionAnalysisFuse(1, 1, tup)", Seq(
      tup("$other_conversions", "", 1, 1, Seq(5), Seq(1), 100.0),
      tup("a", "x", 1, 1, Seq(5), Seq(1), 10.0),
      tup("b", "x", 1, 1, Seq(5), Seq(1), 30.0)))
    val keys = r.getSeq[scala.collection.Seq[String]](0).map(_.head)
    // top-1 of {a, b} = b, plus the others row (sorted key order)
    assert(keys === Seq("$other_conversions", "b"))
  }

  test("empty time samples emit the reference's [0] distribution") {
    val r = fuse("attributionAnalysisFuse(tup)", Seq(
      s"""named_struct(
        'touch_events', array(array('a', 'x')),
        'click_cnt', array(CAST(2 AS BIGINT)),
        'valid_transform_cnt', array(CAST(0 AS BIGINT)),
        'transform_times', array(CAST(array() AS ARRAY<BIGINT>)),
        'transform_steps', array(CAST(array() AS ARRAY<BIGINT>)),
        'value', array(CAST(1.0 AS DOUBLE)),
        'contribution', array(CAST(0.0 AS DOUBLE)))"""))
    assert(r.getSeq[scala.collection.Seq[Long]](4).head === Seq(0L))
    assert(r.getSeq[scala.collection.Seq[Long]](5).head === Seq(0L))
  }

  test("distribution uses the integer-division gap and skips zeros") {
    // times {0, 5, 100}: min=0, max=100, gap = 100/10+1 = 11; the 0
    // sample is excluded from the histogram but shapes min.
    // buckets: 5/11=0 → b0, 100/11=9 → b9.
    val r = fuse("attributionAnalysisFuse(tup)", Seq(
      tup("a", "x", 1, 1, Seq(0, 5, 100), Seq(1), 1.0)))
    assert(r.getSeq[scala.collection.Seq[Long]](4).head ===
      Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
  }

  test("correlationFuse Spearman: perfect monotone pairs give 1") {
    val r = fuse("attributionCorrelationFuse(tup)", Seq(
      tup("a", "x", 1, 1, Seq(5), Seq(1), 1.0),
      tup("a", "x", 2, 2, Seq(5), Seq(1), 1.0),
      tup("a", "x", 3, 3, Seq(5), Seq(1), 1.0)))
    assert(math.abs(r.getSeq[Double](1).head - 1.0) < 1e-12)
  }

  test("correlationFuse all-zero valids give 0 correlation") {
    val r = fuse("attributionCorrelationFuse(tup)", Seq(
      tup("a", "x", 1, 0, Seq(5), Seq(1), 1.0),
      tup("a", "x", 2, 0, Seq(5), Seq(1), 1.0)))
    // trans_sum = 0 per tuple → no features at all → n=0 → 0.0
    assert(r.getSeq[Double](1).head === 0.0)
  }
}
