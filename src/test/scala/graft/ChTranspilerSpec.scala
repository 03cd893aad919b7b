package graft

import graft.sql.{ChFormat, ChTranspiler}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the ClickHouse-syntax transpiler and the TabSeparated
  * formatter backing StatelessCorpusSpec.
  */
class ChTranspilerSpec extends AnyFunSuite {

  private def t(s: String) = ChTranspiler.transpile(s)

  test("array literals become array(); element access becomes element_at") {
    assert(t("SELECT ['a', 'b']") == "SELECT array('a', 'b')")
    assert(t("SELECT [[1],[2]]") == "SELECT array(array(1),array(2))")
    assert(t("SELECT arr[1]") == "SELECT element_at(arr, 1)")
    assert(t("SELECT array(1,2)[2]") == "SELECT element_at(array(1,2), 2)")
  }

  test("parameterized aggregate f(p)(x) merges to registry form f(p, x)") {
    assert(t("SELECT quantileExact(0.5)(x)").replaceAll("\\s+", " ")
      == "SELECT quantileExact(0.5D, x)")
  }

  test("CH types map in CAST targets, including two-arg form") {
    assert(t("SELECT CAST(1 AS Nullable(UInt8))") == "SELECT CAST(1 AS INT)")
    assert(t("SELECT CAST(1, 'UInt64')") == "SELECT CAST(1 AS BIGINT)")
    assert(t("SELECT CAST([1] AS Array(Float64))")
      == "SELECT CAST(array(1) AS ARRAY<DOUBLE>)")
  }

  test("fractional literals take double typing like the reference") {
    assert(t("SELECT 0.1 + 0.2") == "SELECT 0.1D + 0.2D")
    assert(t("SELECT 1e3") == "SELECT 1e3D")
    assert(t("SELECT 0x1F") == "SELECT 0x1F")
  }

  test("tuple element access .N maps to struct field colN") {
    assert(t("SELECT t.1, t.2") == "SELECT t.col1, t.col2")
  }

  test("SETTINGS clause is dropped; ALL JOIN qualifier is dropped") {
    assert(t("SELECT 1 SETTINGS max_threads = 4").trim == "SELECT 1")
    assert(t("SELECT * FROM a ALL LEFT JOIN b USING k")
      .replaceAll("\\s+", " ") == "SELECT * FROM a LEFT JOIN b USING k")
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
}
