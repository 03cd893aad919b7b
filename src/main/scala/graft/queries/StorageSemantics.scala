package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Storage-semantics surface: unique-key upsert reads, deterministic
  * SAMPLE BY key, and the URL scalar-function family
  * (/root/reference/src/Functions/URL/).
  */
object StorageSemantics {

  val defs: Seq[QueryDef] = Seq(
    // Unique-key upsert read: latest event per (user, event_type) —
    // last-writer-wins by (ts, event_id).
    QueryDef(
      "upsert_latest_state",
      (s, dir) =>
        Upsert.latestByVersion(
            Tables(s, dir, "events").withColumn("us", Tables.tsUs(col("ts"))),
            keys = Seq("user_id", "event_type"), version = "us", tiebreak = "event_id")
          .select(col("user_id"), col("event_type"), col("event_id").as("latest_event"),
                  col("us").as("latest_us"))
          .orderBy(col("user_id"), col("event_type")),
      Some("""
        SELECT user_id, event_type, event_id AS latest_event,
          EPOCH_US(ts) AS latest_us
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY EPOCH_US(ts) DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // SAMPLE BY key: md5-prefix deterministic sample (2/16 of keys) —
    // identical row set in any engine at any parallelism (vs statistical
    // df.sample).
    QueryDef(
      "sample_by_key",
      (s, dir) =>
        Tables(s, dir, "orders")
          .filter(Upsert.sampleByKey(col("o_orderkey"), take = 2))
          .agg(count(lit(1)).as("n_sampled"),
               countDistinct(col("o_custkey")).as("n_customers")),
      Some("""
        SELECT COUNT(*) AS n_sampled, COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        WHERE SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '2'""")),

    // URL function family over synthesized URLs (host/path/query parts).
    QueryDef(
      "url_functions",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn("url",
            concat(lit("https://"), col("source"), lit(".example.com/docs/"),
                   col("lang"), lit("/"), col("doc_id"), lit("?fmt=txt&len="), col("n_chars")))
          .select(
            col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("fmt")).as("fmt"),
            parse_url(col("url"), lit("PROTOCOL")).as("proto"))
          .orderBy(col("doc_id"))
          .limit(100),
      Some("""
        SELECT doc_id,
          CONCAT(source, '.example.com') AS host,
          CONCAT('/docs/', lang, '/', doc_id) AS path,
          'txt' AS fmt,
          'https' AS proto
        FROM documents
        ORDER BY doc_id
        LIMIT 100"""))
  )
}
