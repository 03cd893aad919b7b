package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-format source/sink parity (reference file/url table functions
  * read CSV/TSV/JSON/Parquet/ORC/… —
  * /root/reference/src/TableFunctions/registerTableFunctions.cpp:37-50,
  * formats in src/Formats/registerFormats.cpp). Spark mapping:
  * spark.read/write.format(...). spark-avro is not bundled in this
  * distribution, so the covered set is parquet/csv/json/orc.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")

  private def roundtrip(format: String, opts: Map[String, String]): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$format").toString + "/t"
    src.write.options(opts).format(format).save(dir)
    val back = spark.read.options(opts).schema(src.schema).format(format).load(dir)
    assert(back.count() === src.count(), s"$format row count")
    val a = src.agg(sum($"l_orderkey"), sum($"l_linenumber")).collect()(0)
    val b = back.agg(sum($"l_orderkey"), sum($"l_linenumber")).collect()(0)
    assert(a === b, s"$format content checksum")
  }

  test("csv roundtrip with header") {
    roundtrip("csv", Map("header" -> "true", "timestampFormat" -> "yyyy-MM-dd HH:mm:ss"))
  }
  test("json roundtrip") { roundtrip("json", Map.empty) }
  test("orc roundtrip") { roundtrip("orc", Map.empty) }

  test("orc scan pushes down predicates like parquet") {
    val dir = Files.createTempDirectory("graft_orc_push").toString + "/t"
    src.write.format("orc").save(dir)
    val plan = spark.read.format("orc").load(dir)
      .filter($"l_quantity" > 45.0).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      plan.take(1200))
  }
}
