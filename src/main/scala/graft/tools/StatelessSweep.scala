package graft.tools

import graft.sql.{ChFormat, ChTranspiler}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Dev-only: sweep the reference's own stateless SQL tests
  * (tests/queries/4_cnch_stateless/NNNN_*.sql + .reference) against the
  * engine — each candidate file's statements are transpiled
  * (ChTranspiler), run through `spark.sql` with the dialect registry
  * injected, formatted as ClickHouse TabSeparated (ChFormat), and the
  * concatenated output diffed against the reference's own golden file.
  * Prints PASS/FAIL per test plus a tally, and writes the passing list
  * to the path in arg 2 (default target/stateless_pass.txt) for
  * freezing into StatelessCorpusSpec's allowlist.
  *
  * Candidate filter mirrors what is meaningful to run in a single
  * embedded session: pure-SELECT files (no DDL/DML/SET/system tables/
  * FORMAT clauses), the same subset `clickhouse-test` runs statelessly.
  * Usage: runMain graft.tools.StatelessSweep [corpusDir] [outList] [maxFail]
  */
object StatelessSweep {

  private val excludeTokens = Seq(
    "CREATE ", "INSERT ", "DROP ", "SYSTEM.", "ENGINE", "SET ", "USE ",
    "FORMAT ", "ALTER ", "OPTIMIZE ", "ATTACH", "TRUNCATE",
    "{ SERVERERROR", "SLEEP", "TOTYPENAME")

  def candidates(dir: String): Seq[(String, String, String)] = {
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".sql")).toSeq.sorted
      .flatMap { name =>
        val ref = name.dropRight(4) + ".reference"
        val refPath = d.resolve(ref)
        if (!Files.exists(refPath)) None
        else {
          val sqlText = new String(
            Files.readAllBytes(d.resolve(name)), "UTF-8")
          val up = sqlText.toUpperCase
          if (excludeTokens.exists(up.contains) || sqlText.length > 16000) None
          else Some((name,
            sqlText,
            new String(Files.readAllBytes(refPath), "UTF-8")))
        }
      }
  }

  private val echoDirective = """--\s*\{\s*echo(On|Off)?\s*\}""".r

  /** Run one test file; Left(error) or Right(actual output). Honors the
    * `-- {{ echo }}` / echoOn / echoOff directives the way
    * clickhouse-test does: while active, each statement's raw text
    * (leading comments attached, `;` included) precedes its result.
    */
  def run(spark: SparkSession, sqlText: String): Either[String, String] = {
    try {
      var echo = false
      val outputs = ChTranspiler.statementsRaw(sqlText).flatMap {
        case (raw, clean) =>
          echoDirective.findAllMatchIn(raw).foreach { m =>
            echo = m.group(1) == null || m.group(1) == "On"
          }
          val rows = spark.sql(ChTranspiler.transpile(clean)).collect().toSeq
          // an empty-string ROW is an output line; an empty ROWSET is not
          (if (echo) Seq(raw) else Nil) ++
            (if (rows.nonEmpty) Seq(ChFormat.formatRows(rows)) else Nil)
      }
      Right(outputs.mkString("\n"))
    } catch {
      case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator
          .take(2).mkString(" "))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("/root/reference/tests/queries/4_cnch_stateless")
    val outList = if (args.length > 1) args(1) else "target/stateless_pass.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The UDAF layer (sumForEach, retention, topK, …) registers per
    // session, not through SparkSessionExtensions — same as Engine.session.
    graft.Engine.registerFunctions(spark)
    graft.sql.ClickHouseAliases.injectStrict(spark)
    var pass = 0; var diff = 0; var err = 0
    val passed = Seq.newBuilder[String]
    candidates(dir).foreach { case (name, sqlText, expected) =>
      run(spark, sqlText) match {
        case Right(actual) if actual.stripLineEnd == expected.stripLineEnd =>
          pass += 1; passed += name
          println(s"PASS $name")
        case Right(actual) =>
          diff += 1
          println(s"DIFF $name")
          val e = expected.stripLineEnd.linesIterator.take(3).mkString("|")
          val a = actual.stripLineEnd.linesIterator.take(3).mkString("|")
          println(s"  want: ${e.take(160)}")
          println(s"  got:  ${a.take(160)}")
          // full actual output for offline diffing against .reference
          val dumpDir = Paths.get("target/stateless_diff")
          Files.createDirectories(dumpDir)
          Files.write(dumpDir.resolve(name + ".out"),
            (actual.stripLineEnd + "\n").getBytes("UTF-8"))
        case Left(msg) =>
          err += 1
          println(s"ERR  $name: ${msg.take(160)}")
      }
    }
    println(s"[sweep] pass=$pass diff=$diff err=$err")
    Files.createDirectories(Paths.get(outList).getParent)
    Files.write(Paths.get(outList),
      passed.result().mkString("", "\n", "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
