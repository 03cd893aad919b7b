package graft

import org.apache.spark.sql.Row

import graft.sql.ChSession

/** CREATE STATS / CREATE DICTIONARY session DDL — the reference-layout
  * outputs the 45004/45022/01683 corpus families pin, exercised here at
  * unit scale (reference src/Statistics, src/Dictionaries).
  */
class StatsDictSessionSpec extends SparkSpec {

  private def session = new ChSession(spark)

  private def rows(r: ChSession.Result): Seq[Row] = r match {
    case ChSession.Output(rs) => rs
    case other => fail(s"expected Output, got $other")
  }

  test("create stats collects count/ndv/min-max/avg and histograms") {
    val s = session
    s.execute("CREATE TABLE st_t (id UInt64, s String, " +
      "n Nullable(Int32)) ENGINE = CnchMergeTree ORDER BY id")
    s.execute("INSERT INTO st_t VALUES (1, 'ab', 10), (2, 'cdef', NULL)")
    val created = rows(s.execute("CREATE STATS st_t"))
    assert(created === Seq(Row("st_t", "3", "2")))
    val shown = rows(s.execute("SHOW STATS st_t"))
    assert(shown.head === Row("st_t.*", "", "2", "", "", "", "", "", ""))
    // id: count 2, nulls 0, ndv 2, min 1 max 2, width 8, histogram
    assert(shown(1) === Row("st_t.id", "UInt64", "2", "0", "2", "1", "2",
      "8", "1"))
    // s: avg byte size = (9+2 + 9+4)/2 = 12 (byteSize semantics)
    assert(shown(2)(7) === "12")
    // n: declared Nullable — one null row
    assert(shown(3) === Row("st_t.n", "Nullable(Int32)", "1", "1", "1",
      "10", "10", "4", "1"))
    val buckets = rows(s.execute("SHOW COLUMN_STATS st_t"))
    assert(buckets.head === Row("st_t.id", "0", "[1, 1]", "1", "1", "1", "1"))
    s.execute("DROP STATS st_t")
    assert(s.execute("SHOW STATS st_t") === ChSession.Done)
  }

  test("create dictionary registers defaults, hierarchy and a view") {
    val s = session
    s.execute("CREATE TABLE d_src (id UInt64, v String, parent UInt64) " +
      "ENGINE = CnchMergeTree ORDER BY id")
    s.execute("INSERT INTO d_src VALUES (1, 'a', 0), (2, 'b', 1)")
    s.execute("""CREATE DICTIONARY d_dict (
        id UInt64, v String DEFAULT 'dflt', parent UInt64 HIERARCHICAL)
      PRIMARY KEY id
      SOURCE(CLICKHOUSE(TABLE 'd_src')) LIFETIME(MIN 1 MAX 10)
      LAYOUT(FLAT())""")
    try {
      val got = spark.sql(
        "SELECT dictGet('d_dict', 'v', 2), dictGet('d_dict', 'v', 9), " +
          "dictGetHierarchy('d_dict', 2)").collect()(0)
      assert(got.getString(0) === "b")
      assert(got.getString(1) === "dflt") // declared DEFAULT on miss
      assert(got.getSeq[Long](2) === Seq(2L, 1L)) // stops at non-member 0
      // the dictionary is queryable as a table
      assert(spark.sql("SELECT count(*) FROM d_dict").collect()(0)
        .getLong(0) === 2L)
    } finally s.execute("DROP DICTIONARY d_dict")
  }
}
