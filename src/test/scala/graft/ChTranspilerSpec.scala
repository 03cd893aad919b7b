package graft

import graft.sql.{ChFormat, ChTranspiler}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the ClickHouse-syntax transpiler and the TabSeparated
  * formatter backing StatelessCorpusSpec.
  */
class ChTranspilerSpec extends AnyFunSuite {

  private def t(s: String) = ChTranspiler.transpile(s)

  test("array literals become array(); element access becomes arrayElement") {
    assert(t("SELECT ['a', 'b']") == "SELECT array('a', 'b')")
    assert(t("SELECT [[1],[2]]") == "SELECT array(array(1),array(2))")
    assert(t("SELECT arr[1]") == "SELECT arrayElement(arr, 1)")
    assert(t("SELECT array(1,2)[2]") == "SELECT arrayElement(array(1,2), 2)")
  }

  test("parameterized aggregate f(p)(x) merges to registry form f(p, x)") {
    assert(t("SELECT quantileExact(0.5)(x)").replaceAll("\\s+", " ")
      == "SELECT quantileExact(0.5D, x)")
  }

  test("CH types map in CAST targets, including two-arg form") {
    // CAST to a Nullable scalar yields NULL on bad input (the
    // reference's ConvertThroughParsing null_presence) — lowered to
    // the range-checked OrNull conversion, not a plain ANSI cast
    assert(t("SELECT CAST(1 AS Nullable(UInt8))")
      == "SELECT toUInt8OrNull(1 )")
    assert(t("SELECT CAST(1, 'UInt64')") == "SELECT CAST(1 AS BIGINT)")
    assert(t("SELECT CAST([1] AS Array(Float64))")
      == "SELECT CAST(array(1) AS ARRAY<DOUBLE>)")
  }

  test("fractional literals take double typing like the reference") {
    assert(t("SELECT 0.1 + 0.2") == "SELECT 0.1D + 0.2D")
    assert(t("SELECT 1e3") == "SELECT 1e3D")
    assert(t("SELECT 0x1F") == "SELECT 31")
  }

  test("tuple element access .N maps to struct field colN") {
    assert(t("SELECT t.1, t.2") == "SELECT t.col1, t.col2")
  }

  test("SETTINGS clause is dropped; ALL JOIN qualifier is dropped") {
    assert(t("SELECT 1 SETTINGS max_threads = 4").trim == "SELECT 1")
    assert(t("SELECT * FROM a ALL LEFT JOIN b USING k")
      .replaceAll("\\s+", " ") == "SELECT * FROM a LEFT JOIN b USING (k)")
  }

  test("CH \\xHH string escapes decode to Spark-parseable literals") {
    assert(t("SELECT '\\x41'") == "SELECT 'A'")
    assert(t("SELECT 'a\\tb'") == "SELECT 'a\\tb'")
  }

  test("statement splitting respects string literals and comments") {
    val stmts = ChTranspiler.statements(
      "SELECT 'a;b'; -- c;\nSELECT 2; /* x; */ SELECT 3")
    assert(stmts == Seq("SELECT 'a;b'", "SELECT 2", "SELECT 3"))
  }

  test("TabSeparated float formatting matches the reference's style") {
    assert(ChFormat.formatFloat(1.0) == "1")
    assert(ChFormat.formatFloat(0.5) == "0.5")
    assert(ChFormat.formatFloat(1e30) == "1e30")
    assert(ChFormat.formatFloat(Double.NaN) == "nan")
    assert(ChFormat.formatFloat(Double.PositiveInfinity) == "inf")
  }

  test("ORDER BY keys gain CH null direction: last on ASC, first on DESC") {
    assert(t("SELECT a FROM t ORDER BY a").replaceAll("\\s+", " ")
      == "SELECT a FROM t ORDER BY a NULLS LAST")
    assert(t("SELECT a FROM t ORDER BY a DESC, b LIMIT 3").replaceAll("\\s+", " ")
      == "SELECT a FROM t ORDER BY a DESC NULLS FIRST, b NULLS LAST LIMIT 3")
    // explicit direction is left alone; window OVER clauses get it too
    assert(t("SELECT a FROM t ORDER BY a NULLS FIRST").replaceAll("\\s+", " ")
      == "SELECT a FROM t ORDER BY a NULLS FIRST")
    assert(t("SELECT rank() OVER (ORDER BY x) FROM t").replaceAll("\\s+", " ")
      == "SELECT rank() OVER (ORDER BY x NULLS LAST) FROM t")
  }

  test("ARRAY JOIN with alias becomes LATERAL VIEW explode") {
    val out = t("SELECT x, a FROM (SELECT 1 AS x, [1,2] AS arr) ARRAY JOIN arr AS a")
      .replaceAll("\\s+", " ")
    assert(out.contains("LATERAL VIEW explode(arr)"), out)
    assert(out.contains("AS a"), out)
  }

  test("bare ARRAY JOIN replaces the array column with its element") {
    val out = t("SELECT x FROM (SELECT 1 AS x, [1,2] AS arr) ARRAY JOIN arr")
      .replaceAll("\\s+", " ")
    assert(out.contains("SELECT * EXCEPT (arr)"), out)
    assert(out.contains("AS arr"), out)
  }

  test("multi-item ARRAY JOIN zips positionally via one explode") {
    val out = t("SELECT x, y FROM t ARRAY JOIN a1 AS x, a2 AS y WHERE x > 0")
      .replaceAll("\\s+", " ")
    assert(out.contains("named_struct('c0', try_element_at(a1,"), out)
    assert(out.contains("'c1', try_element_at(a2,"), out)
    // alias references outside the clause rewritten to struct fields
    assert(out.matches(".*SELECT __aj_s\\d+\\.c0, __aj_s\\d+\\.c1 .*"), out)
    assert(out.matches(".*WHERE __aj_s\\d+\\.c0 > 0.*"), out)
  }

  test("two-arg CAST balances nested parens; Enum/FixedString → STRING") {
    assert(t("select cast(materialize(2.0),'Decimal(9,3)')")
      == "select CAST(materialize(2.0D) AS Decimal(9,3))")
    // Enum casts keep the member map (chEnum resolves values OR names
    // to the member name at analysis time)
    assert(t("SELECT CAST('a' AS Enum8('a' = 1, 'b' = 2))")
      == "SELECT chEnum('a' ,'a',1,'b',2)")
    assert(t("SELECT CAST('abc' AS FixedString(3))")
      == "SELECT CAST('abc' AS STRING)")
  }

  test("tuple literals become struct(); IN lists unwrap array/tuple") {
    assert(t("SELECT ('1',2) AS t") == "SELECT struct('1',2) AS t")
    assert(t("SELECT (1+2) * 3") == "SELECT (1+2) * 3") // grouping untouched
    assert(t("SELECT f(a, b)") == "SELECT f(a, b)")     // call args untouched
    assert(t("select (1, 2) in ((1, 2), (3, 4))")
      == "select struct(1, 2) in (struct(1, 2), struct(3, 4))")
    assert(t("select 1 in [1, 2]") == "select 1 in (1, 2)")
    assert(t("select (1, 2) in tuple((1, 2))")
      == "select struct(1, 2) in (struct(1, 2))")
  }

  test("inline expression aliases are stripped and substituted") {
    assert(t("SELECT 'x' AS v, v LIKE (concat('%', v) AS pat), pat")
      .replaceAll("\\s+", " ")
      == "SELECT 'x' AS v, v LIKE (concat('%', v)), (concat('%', v))")
    // CAST's AS and subquery-level AS are untouched
    assert(t("SELECT CAST(1 AS UInt8) FROM (SELECT 1 AS a)")
      == "SELECT CAST(1 AS INT) FROM (SELECT 1 AS a)")
  }

  test("nested arrayJoin hoists to a LATERAL VIEW; lone top-level stays") {
    val out = t("SELECT toUInt32OrZero(arrayJoin(['1', '2a']))")
      .replaceAll("\\s+", " ")
    assert(out.contains("FROM (SELECT 1 AS"), out)
    assert(out.contains("LATERAL VIEW explode(array('1', '2a'))"), out)
    assert(t("SELECT arrayJoin([1,2]) AS x") == "SELECT arrayJoin(array(1,2)) AS x")
    // repeated same-argument calls share one explode (CSE rule)
    val two = t("SELECT arrayJoin([1,2]) + arrayJoin([1,2])")
    assert("LATERAL VIEW".r.findAllIn(two).size == 1, two)
  }

  test("statementsRaw keeps the raw text for clickhouse-test echo mode") {
    val raws = ChTranspiler.statementsRaw(
      "select 1;\n-- { echo }\nselect 2;")
    assert(raws.map(_._2) == Seq("select 1", "select 2"))
    assert(raws(1)._1 == "-- { echo }\nselect 2;")
  }

  test("bare USING lists gain parentheses; parenthesized pass through") {
    assert(t("SELECT * FROM a JOIN b USING k1, k2 WHERE k1 > 0")
      .replaceAll("\\s+", " ")
      == "SELECT * FROM a JOIN b USING (k1, k2) WHERE k1 > 0")
    assert(t("SELECT * FROM a JOIN b USING (k)").contains("USING (k)"))
  }

  test("comments are stripped before token passes") {
    // a comma inside a comment must not split the scalar WITH items
    val r = t("SELECT x FROM (WITH 1 AS a, -- c1, c2 --\n 2 AS b SELECT a + b AS x)")
    assert(!r.contains("c1"), r)
    assert(r.replaceAll("\\s+", "").contains("1+2"), r)
  }

  test("scalar WITH rewrites inside subqueries") {
    val r = t("SELECT * FROM (WITH 41 AS v SELECT v + 1 AS x)")
    assert(r.replaceAll("\\s+", "").contains("41+1"), r)
  }

  test("lambda-body ternary keeps the arrow head") {
    val r = t("SELECT arrayMap(x -> x = 1 ? 10 : x, [1, 2])")
    assert(r.contains("x -> if(x = 1, 10, x)"), r)
  }

  test("typed VALUES table function lowers to a Spark inline table") {
    val r = t("SELECT x, s FROM VALUES('x UInt64, s String', (1, 'a'), (2, 'b'))")
      .replaceAll("\\s+", " ")
    assert(r.contains("FROM VALUES (1, 'a'), (2, 'b') AS __chv(x, s)"), r)
    assert(r.contains("CAST(x AS BIGINT) AS x"), r)
    // computed ALIAS columns come from the spec, not the tuples
    val r2 = t("SELECT z FROM VALUES('x UInt64, z ALIAS x + 1', (1), (2))")
    assert(r2.contains("AS z"), r2)
  }

  test("FROM-less dummy resolves (constant-0 rewrite or the one view)") {
    // an earlier pass folds bare dummy to its constant 0 when no table
    // provides it; either way the statement must not dangle
    val r = t("SELECT dummy, sum(dummy) GROUP BY dummy")
    assert(r.contains("FROM one") || r.contains("(0)"), r)
    // a FROM-less select without dummy stays untouched
    assert(!t("SELECT 1 + 1").contains("FROM one"))
  }

  test("expression-context subqueries leading with a string literal parse-guard") {
    val r = t("SELECT 'a' IN (SELECT 'a')")
    assert(r.contains("(SELECT CAST('a' AS STRING))"), r)
  }

  test("IN with a scalar literal right side gains parens") {
    assert(t("SELECT 1 IN 1").contains("IN (1)"))
    assert(t("SELECT 'a' IN 'a'").contains("IN ('a')"))
  }

  test("DATETIME typed literal becomes TIMESTAMP") {
    assert(t("SELECT DATETIME '2020-01-01 00:00:00'")
      .contains("TIMESTAMP '2020-01-01 00:00:00'"))
  }

  test("WITH TOTALS without GROUP BY or aggregation errors like the reference") {
    intercept[IllegalArgumentException] {
      ChTranspiler.splitTotals("SELECT 1 AS n WITH TOTALS")
    }
    // aggregation without GROUP BY is the legal global-totals form
    assert(ChTranspiler.splitTotals("SELECT count() WITH TOTALS").isDefined)
  }

  test("ANY LEFT/INNER JOIN lowers to keep-first-per-key dedup of the right side") {
    val s = t("SELECT * FROM a ANY LEFT JOIN b USING (k)")
    assert(!s.matches("(?is).*\\bany\\b.*"), s)
    assert(s.contains(
      "row_number() OVER (PARTITION BY k ORDER BY __graft_any_rid)"), s)
    assert(s.contains("FROM b) __graft_any_s"), s)
    // ON form: partition keys from the right relation's side
    val s2 = t("SELECT * FROM a ANY INNER JOIN b ON a.x = b.y AND b.w = a.z")
    assert(s2.contains("PARTITION BY y, w"), s2)
    // reversed spelling LEFT ANY JOIN
    val s3 = t("SELECT * FROM a LEFT ANY JOIN b USING (k)")
    assert(s3.contains("__graft_any_rn"), s3)
    // subquery right side with alias keeps the alias on the dedup wrapper
    val s4 = t("SELECT * FROM a ANY LEFT JOIN (SELECT 1 AS k) z USING (k)")
    assert(s4.contains("WHERE __graft_any_rn = 1) z"), s4)
    // RIGHT/FULL ANY fall back to dropping the qualifier (legacy)
    val s5 = t("SELECT * FROM a ANY RIGHT JOIN b USING (k)")
    assert(!s5.matches("(?is).*\\bany\\b.*") && !s5.contains("__graft_any"), s5)
    // complex ON conditions fall back to dropping the qualifier
    val s6 = t("SELECT * FROM a ANY LEFT JOIN b ON a.x = b.y + 1")
    assert(!s6.matches("(?is).*\\bany\\b.*") && !s6.contains("__graft_any"), s6)
  }

  test("union branches are parenthesized; trailing LIMIT binds to the last branch") {
    val s = t("SELECT 1 UNION ALL SELECT 2 LIMIT 1")
    assert(s.replaceAll("\\s+", " ").trim ==
      "( SELECT 1 ) UNION ALL ( SELECT 2 LIMIT 1 )", s)
    // already-wrapped branches stay untouched
    val s2 = t("(SELECT 1) UNION ALL (SELECT 2)")
    assert(s2.trim == "(SELECT 1) UNION ALL (SELECT 2)", s2)
    // mixed set operators keep left-assoc precedence (no regrouping)
    val s3 = t("SELECT 1 UNION ALL SELECT 2 EXCEPT SELECT 3")
    assert(!s3.contains("( SELECT"), s3)
  }

  test("COLLATE lowers to a collation sort key; remote() unwraps to its table") {
    val s = t("SELECT * FROM t ORDER BY s COLLATE 'ru'")
    assert(s.contains("chCollateKey(s, 'ru')"), s)
    val s2 = t("SELECT 1 FROM remote('127.0.0.1,localhos', system.one)")
    assert(s2.contains("FROM system.one") || s2.contains("FROM one"), s2)
  }

  test("inline alias substitution strips nested inline aliases") {
    val s = t("SELECT f(g('x' AS a) AS b) AS c, b = a")
    assert(!s.matches("(?is).*\\(\\s*g\\('x' AS a\\)\\s*\\).*"), s)
    assert(s.contains("(g('x')) = ('x')"), s)
  }
}
