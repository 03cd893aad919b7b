package graft

import graft.tools.StatelessSweep
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's OWN stateless SQL tests, run verbatim: each
  * allowlisted `NNNN_*.sql` from
  * /root/reference/tests/queries/4_cnch_stateless/ is transpiled
  * (ChTranspiler), executed through `spark.sql` with the dialect
  * registry, formatted as ClickHouse TabSeparated (ChFormat), and
  * string-compared against the reference's own `.reference` golden
  * file — the same check `tests/clickhouse-test:386` performs against
  * the real server. This is the literal "a reference user's queries
  * run unchanged" gate; the allowlist is the frozen output of
  * tools/StatelessSweep (re-run it after dialect work to widen).
  */
class StatelessCorpusSpec extends SparkSpec {

  private val corpusDir = "/root/reference/tests/queries/4_cnch_stateless"

  private lazy val allowlist: Seq[String] = {
    val url = getClass.getResource("/stateless_allowlist.txt")
    assert(url != null, "stateless_allowlist.txt missing from test resources")
    scala.io.Source.fromURL(url).getLines().map(_.trim)
      .filter(_.nonEmpty).toSeq
  }

  test("allowlist is frozen and non-trivial") {
    assert(allowlist.size >= 140, s"allowlist shrank to ${allowlist.size}")
  }

  /** Isolated corpus session: the strict CH overrides (length = bytes)
    * must not leak into the shared test session's registry, and — since
    * r16 runs the corpus files CONCURRENTLY — every file gets its OWN
    * child session so temp-view names (the corpus reuses t/t1/test
    * across files) cannot collide. All settings are per-session, so the
    * banked goldens see exactly the sequential runner's environment:
    * same master, same 8 shuffle partitions, same Moscow tz.
    */
  private def mkCorpusSession(): org.apache.spark.sql.SparkSession = {
    val session = spark.newSession()
    Engine.registerFunctions(session)
    graft.sql.ClickHouseAliases.injectStrict(session)
    // the corpus's golden outputs assume server tz Europe/Moscow
    session.conf.set("spark.sql.session.timeZone", "Europe/Moscow")
    // CH has no ordinal GROUP BY / ORDER BY (same as StatelessSweep)
    // match the sweep runner's partition count: set-operation row order
    // is partition-order-deterministic, so the banked goldens assume it
    session.conf.set("spark.sql.shuffle.partitions", "8")
    session.conf.set("spark.sql.groupByOrdinal", "false")
    session.conf.set("spark.sql.orderByOrdinal", "false")
    session.conf.set(graft.sql.ChJoinDefaults.Flag, "true")
    session.conf.set(graft.sql.ChRollupDefaults.Flag, "true")
    session.conf.set(graft.sql.ChCoercions.IeeeDivFlag, "true")
    session.conf.set(graft.sql.ChCoercions.SetOpsAllFlag, "true")
    session.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    session.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    session
  }

  test("every allowlisted reference stateless test passes verbatim") {
    assume(Files.isDirectory(Paths.get(corpusDir)), "reference corpus absent")
    // r16: this sweep was 2120 s of the suite's 2374 s — one file at a
    // time, each file a chain of tiny Spark jobs that left the host
    // idle. The files are independent (per-file ChSession over a
    // per-file child SparkSession), so run them from a thread pool
    // (guide §2.6 "overlap independent jobs"): StatelessSweep.run pins
    // the active session per thread, and job content/row order per file
    // is untouched (same confs, same partition counts — concurrency
    // changes WHEN jobs run, not what they compute).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures =
      try {
        val futs = allowlist.map { name =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] = {
              val sqlText = new String(
                Files.readAllBytes(Paths.get(corpusDir, name)), "UTF-8")
              val expected = new String(
                Files.readAllBytes(Paths.get(corpusDir,
                  name.dropRight(4) + ".reference")), "UTF-8")
              StatelessSweep.run(mkCorpusSession(), sqlText) match {
                case Right(actual)
                    if actual.replaceAll("\n+$", "") ==
                      expected.replaceAll("\n+$", "") =>
                  None
                case Right(actual) =>
                  Some(s"$name: output diff\n  want ${expected.take(120)}\n  got ${actual.take(120)}")
                case Left(err) =>
                  Some(s"$name: $err")
              }
            }
          })
        }
        futs.flatMap(_.get())
      } finally {
        pool.shutdown()
        // a corpus session (Moscow tz, CH coercions) must not linger as
        // the thread's active session — later suites' lazy plan
        // optimization reads SQLConf.get from it (timestamp literals
        // in golden plans would shift by the Moscow offset)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    assert(failures.isEmpty,
      s"${failures.size} stateless tests regressed:\n${failures.take(10).mkString("\n")}")
  }
}
