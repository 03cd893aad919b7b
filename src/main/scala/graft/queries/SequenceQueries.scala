package graft.queries

import graft.{QueryDef, Tables}
import graft.aggregates.SequenceMatchAgg.{sequenceCount, sequenceMatch}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sequenceMatch / sequenceCount pattern-DSL queries (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionSequenceMatch.h —
  * the `(?N)` / `(?t<=D)` / `.` / `.*` pattern language, exercised across
  * tests/queries/4_cnch_stateless/00xxx_sequence_match*).
  *
  * Oracle notes: event rows per user are sorted by (ts, flag-bits) inside
  * the aggregate; the driver data has no per-user µs-timestamp ties, and
  * flag bit order follows pattern event order, so "later list position"
  * is exactly `us >=` between rows of different event types in the SQL
  * oracles below. Durations are µs (the unit of unix_micros).
  */
object SequenceQueries {

  private val Day = 86400000000L // µs
  private val Hour = 3600000000L // µs

  val defs: Seq[QueryDef] = Seq(

    // (?1)(?t<=4h)(?2).*(?3): signup, then click within 4 hours of the
    // signup, then purchase any time later — the reference's flagship
    // time-bound pattern shape, backtracking path. The 4h window splits
    // the sf0.01 population ~82/150, so the oracle discriminates.
    QueryDef(
      "sequence_match_pattern",
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_type").isin("signup", "click", "purchase"))
          .groupBy(col("user_id"))
          .agg(sequenceMatch(s"(?1)(?t<=${4 * Hour})(?2).*(?3)")(
            Tables.tsUs(col("ts")),
            col("event_type") === "signup",
            col("event_type") === "click",
            col("event_type") === "purchase").as("m"))
          .agg(count(when(col("m"), 1)).as("n_matched_users"),
               count(lit(1)).as("n_users")),
      // Oracle is the linear window form (the triple self-join took 52 s
      // at sf0.1; this takes 40 ms): run_s = latest signup at-or-before
      // each row, so a click is "good" iff its best anchor is within 4h;
      // run_gc = any good click at-or-before each row; a purchase matches
      // iff a good click precedes it. RANGE frames include same-us peers.
      Some(s"""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        w1 AS (SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'signup' THEN us END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_s
          FROM u),
        w2 AS (SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'click' AND run_s IS NOT NULL
                     AND us - run_s <= ${4 * Hour} THEN 1 END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_gc
          FROM w1),
        f AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'purchase' AND run_gc = 1 THEN 1 ELSE 0 END) AS m
          FROM w2 GROUP BY user_id)
        SELECT CAST(SUM(m) AS BIGINT) AS n_matched_users,
               COUNT(*) AS n_users FROM f""")),

    // (?1)(?t>=25d)(?2): error at least 25 days after a signup — the
    // time-greater scan path (early rows are skipped, not backtracked).
    // 25d splits the sf0.01 population ~90/150.
    QueryDef(
      "sequence_match_time_ge",
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_type").isin("signup", "error"))
          .groupBy(col("user_id"))
          .agg(sequenceMatch(s"(?1)(?t>=${25 * Day})(?2)")(
            Tables.tsUs(col("ts")),
            col("event_type") === "signup",
            col("event_type") === "error").as("m"))
          .agg(count(when(col("m"), 1)).as("n_matched_users"),
               count(lit(1)).as("n_users")),
      Some(s"""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'error')),
        m AS (SELECT DISTINCT s.user_id FROM u s
              JOIN u e ON e.user_id = s.user_id AND e.event_type = 'error'
                AND e.us >= s.us + ${25 * Day}
              WHERE s.event_type = 'signup')
        SELECT (SELECT COUNT(*) FROM m) AS n_matched_users,
               (SELECT COUNT(DISTINCT user_id) FROM u) AS n_users""")),

    // (?1).(?2): signup, one row of anything (among signup/purchase
    // rows), then purchase — the AnyEvent action. The list the pattern
    // walks contains only rows where >=1 condition holds, so `.` consumes
    // one signup-or-purchase row; LEAD(.., 2) over the same filtered set
    // is the oracle.
    QueryDef(
      "sequence_match_any_gap",
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_type").isin("signup", "purchase"))
          .groupBy(col("user_id"))
          .agg(sequenceMatch("(?1).(?2)")(
            Tables.tsUs(col("ts")),
            col("event_type") === "signup",
            col("event_type") === "purchase").as("m"))
          .agg(count(when(col("m"), 1)).as("n_matched_users"),
               count(lit(1)).as("n_users")),
      Some("""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'purchase')),
        l AS (SELECT user_id, event_type,
                LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY us) AS nxt2
              FROM u)
        SELECT COUNT(DISTINCT CASE WHEN event_type = 'signup' AND nxt2 = 'purchase'
                                   THEN user_id END) AS n_matched_users,
               COUNT(DISTINCT user_id) AS n_users
        FROM l""")),

    // (?1).*(?2).*(?3) with no time constraint: runs the linear DFA
    // engine (the reference's dfaMatch fast path).
    QueryDef(
      "sequence_match_dfa",
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_type").isin("signup", "click", "purchase"))
          .groupBy(col("user_id"))
          .agg(sequenceMatch("(?1).*(?2).*(?3)")(
            Tables.tsUs(col("ts")),
            col("event_type") === "signup",
            col("event_type") === "click",
            col("event_type") === "purchase").as("m"))
          .agg(count(when(col("m"), 1)).as("n_matched_users"),
               count(lit(1)).as("n_users")),
      // Linear window form of subsequence existence (triple self-join took
      // 46 s at sf0.1; this takes 70 ms): any signup before, then any
      // click with a signup before it, then any purchase after such click.
      Some("""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        w1 AS (SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'signup' THEN us END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_s
          FROM u),
        w2 AS (SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'click' AND run_s IS NOT NULL THEN 1 END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sc
          FROM w1),
        f AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'purchase' AND run_sc = 1 THEN 1 ELSE 0 END) AS m
          FROM w2 GROUP BY user_id)
        SELECT CAST(SUM(m) AS BIGINT) AS n_matched_users,
               COUNT(*) AS n_users FROM f""")),

    // sequenceNextNode(forward, first_match) (reference
    // AggregateFunctionSequenceNextNode.cpp:141): after the first
    // consecutive signup→click chain in each user's stream, which event
    // comes next? Pure lead()-window plan — one shuffle on user_id, the
    // chain match and the next-node read share one sorted pass.
    QueryDef(
      "sequence_next_node",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val ev = Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .withColumn("n1", lead(col("event_type"), 1).over(w))
          .withColumn("n2", lead(col("event_type"), 2).over(w))
        val wm = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        ev.filter(col("event_type") === "signup" && col("n1") === "click")
          .withColumn("rn", row_number().over(wm))
          .filter(col("rn") === 1)
          .groupBy(coalesce(col("n2"), lit("END")).as("next_node"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("next_node"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, EPOCH_US(ts) AS us, event_type,
            LEAD(event_type, 1) OVER w AS n1,
            LEAD(event_type, 2) OVER w AS n2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id)),
        m AS (
          SELECT n2,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
          FROM o WHERE event_type = 'signup' AND n1 = 'click')
        SELECT COALESCE(n2, 'END') AS next_node, COUNT(*) AS n_users
        FROM m WHERE rn = 1
        GROUP BY 1
        ORDER BY next_node""")),

    // sequenceCount('(?1)(?2)'): adjacent click→purchase pairs in the
    // click/purchase row list, counted greedily non-overlapping. With
    // single-flag rows adjacent matches can never overlap, so the greedy
    // count equals the plain LEAD-adjacency count — the SQL oracle.
    QueryDef(
      "sequence_count_adjacent",
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(col("user_id"))
          .agg(sequenceCount("(?1)(?2)")(
            Tables.tsUs(col("ts")),
            col("event_type") === "click",
            col("event_type") === "purchase").as("cnt"))
          .agg(sum(col("cnt")).as("total_matches"),
               count(when(col("cnt") > 0, 1)).as("users_with_match"),
               max(col("cnt")).as("max_per_user")),
      Some("""
        WITH u AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('click', 'purchase')),
        l AS (SELECT user_id, event_type,
                LEAD(event_type) OVER (PARTITION BY user_id ORDER BY us) AS nxt
              FROM u),
        c AS (SELECT user_id,
                COUNT(CASE WHEN event_type = 'click' AND nxt = 'purchase' THEN 1 END) AS cnt
              FROM l GROUP BY user_id)
        SELECT CAST(SUM(cnt) AS BIGINT) AS total_matches,
               COUNT(CASE WHEN cnt > 0 THEN 1 END) AS users_with_match,
               CAST(MAX(cnt) AS BIGINT) AS max_per_user
        FROM c"""))
  )
}
