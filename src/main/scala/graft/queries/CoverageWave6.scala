package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.RowOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage wave 2: the remaining aggregate-combinator families
  * (-OrNull / -OrDefault / -Distinct / -Resample, reference
  * AggregateFunctionCombinatorFactory.cpp), anyHeavy, formatDateTime,
  * the row-order functions runningDifference / neighbor as deterministic
  * window forms, and sequenceNextNode's backward/last_match direction
  * (reference AggregateFunctionSequenceNextNode.cpp — the forward/
  * first_match direction lives in SequenceQueries.scala).
  *
  * Scale notes: every query here is a single hash aggregate or a single
  * window pass (one shuffle on its key). The -Resample lowering keeps
  * the whole bucket array inside one aggregate node — no explode, no
  * per-bucket scans.
  */
object CoverageWave6 {

  val defs: Seq[QueryDef] = Seq(

    // -OrNull / -OrDefault / -Distinct combinator instances. Region 0
    // has no nation with key > 20, so the OrNull columns discriminate
    // NULL-on-empty from genuine values and the OrDefault columns show
    // the fallback.
    QueryDef(
      "agg_or_combinators",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_regionkey,
            countOrNull(CASE WHEN n_nationkey > 20 THEN 1 END) AS hi_cnt,
            sumOrNull(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS hi_sum,
            sumOrDefault(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS hi_sum_d,
            avgOrDefault(CASE WHEN n_nationkey > 20
                              THEN CAST(n_nationkey AS DOUBLE) END) AS hi_avg_d,
            minOrNull(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS hi_min,
            maxOrDefault(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS hi_max_d,
            countDistinct(n_nationkey % 3) AS k3,
            sumDistinct(n_nationkey % 3) AS s3,
            avgDistinct(CAST(n_nationkey % 3 AS DOUBLE)) AS a3
          FROM nation
          GROUP BY n_regionkey
          ORDER BY n_regionkey""")
      },
      Some("""
        SELECT n_regionkey,
          NULLIF(COUNT(CASE WHEN n_nationkey > 20 THEN 1 END), 0) AS hi_cnt,
          CAST(SUM(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS BIGINT) AS hi_sum,
          COALESCE(CAST(SUM(CASE WHEN n_nationkey > 20 THEN n_nationkey END)
            AS BIGINT), 0) AS hi_sum_d,
          COALESCE(AVG(CASE WHEN n_nationkey > 20
                            THEN CAST(n_nationkey AS DOUBLE) END), 0) AS hi_avg_d,
          MIN(CASE WHEN n_nationkey > 20 THEN n_nationkey END) AS hi_min,
          COALESCE(MAX(CASE WHEN n_nationkey > 20 THEN n_nationkey END), 0) AS hi_max_d,
          COUNT(DISTINCT n_nationkey % 3) AS k3,
          CAST(SUM(DISTINCT n_nationkey % 3) AS BIGINT) AS s3,
          AVG(DISTINCT CAST(n_nationkey % 3 AS DOUBLE)) AS a3
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey""")),

    // -Resample: quantity range [1, 51) in steps of 10 → 5 buckets;
    // integer sums so the bucket arrays compare bit-exact (FLOOR on both
    // sides — DuckDB's double→BIGINT cast rounds while Spark's
    // truncates).
    QueryDef(
      "agg_resample",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        // The -Resample buckets are fixed-width (5), so project them to
        // scalar columns for the driver gate, which can't hash array cells.
        s.sql("""
          SELECT l_linestatus,
            cnt_by_qty[0] AS c1, cnt_by_qty[1] AS c2, cnt_by_qty[2] AS c3,
            cnt_by_qty[3] AS c4, cnt_by_qty[4] AS c5,
            centiprice_by_qty[0] AS p1, centiprice_by_qty[1] AS p2,
            centiprice_by_qty[2] AS p3, centiprice_by_qty[3] AS p4,
            centiprice_by_qty[4] AS p5
          FROM (
            SELECT l_linestatus,
              countResample(1, 51, 10, l_orderkey,
                            CAST(FLOOR(l_quantity) AS BIGINT)) AS cnt_by_qty,
              sumResample(1, 51, 10, CAST(FLOOR(l_extendedprice / 100) AS BIGINT),
                          CAST(FLOOR(l_quantity) AS BIGINT)) AS centiprice_by_qty
            FROM lineitem
            GROUP BY l_linestatus)
          ORDER BY l_linestatus""")
      },
      Some("""
        WITH t AS (SELECT l_linestatus,
            CAST(FLOOR(l_quantity) AS BIGINT) AS q,
            CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS p
          FROM lineitem)
        SELECT l_linestatus,
          COUNT(CASE WHEN q >= 1 AND q < 11 THEN 1 END) AS c1,
          COUNT(CASE WHEN q >= 11 AND q < 21 THEN 1 END) AS c2,
          COUNT(CASE WHEN q >= 21 AND q < 31 THEN 1 END) AS c3,
          COUNT(CASE WHEN q >= 31 AND q < 41 THEN 1 END) AS c4,
          COUNT(CASE WHEN q >= 41 AND q < 51 THEN 1 END) AS c5,
          COALESCE(CAST(SUM(CASE WHEN q >= 1 AND q < 11 THEN p END) AS BIGINT), 0) AS p1,
          COALESCE(CAST(SUM(CASE WHEN q >= 11 AND q < 21 THEN p END) AS BIGINT), 0) AS p2,
          COALESCE(CAST(SUM(CASE WHEN q >= 21 AND q < 31 THEN p END) AS BIGINT), 0) AS p3,
          COALESCE(CAST(SUM(CASE WHEN q >= 31 AND q < 41 THEN p END) AS BIGINT), 0) AS p4,
          COALESCE(CAST(SUM(CASE WHEN q >= 41 AND q < 51 THEN p END) AS BIGINT), 0) AS p5
        FROM t
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    // formatDateTime: the C-strftime specifier table translated into
    // Spark DateTimeFormatter patterns at plan time, including quoted
    // literal text ('day', 'of') and composite specifiers (%F, %T).
    QueryDef(
      "format_datetime_dialect",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            min(formatDateTime(ts, '%F')) AS first_day,
            max(formatDateTime(ts, '%Y/%m')) AS last_ym,
            countDistinct(formatDateTime(ts, '%b %Y')) AS n_months,
            min(formatDateTime(ts, 'day %j of %Y, %T')) AS first_stamp,
            max(formatDateTime(ts, '%I %p')) AS max_ampm
          FROM events
          GROUP BY event_type
          ORDER BY event_type""")
      },
      Some("""
        SELECT event_type,
          MIN(STRFTIME(ts, '%Y-%m-%d')) AS first_day,
          MAX(STRFTIME(ts, '%Y/%m')) AS last_ym,
          COUNT(DISTINCT STRFTIME(ts, '%b %Y')) AS n_months,
          MIN(STRFTIME(ts, 'day %j of %Y, %H:%M:%S')) AS first_stamp,
          MAX(STRFTIME(ts, '%I %p')) AS max_ampm
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // runningDifference + neighbor over the per-user event stream. Both
    // functions share one (partition, order) → a single Window node, one
    // shuffle on user_id.
    QueryDef(
      "running_difference_neighbor",
      (s, dir) => {
        val part = Seq(col("user_id"))
        val ord = Seq(col("us"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .select(col("user_id"), col("event_id"),
            RowOrder.runningDifference(col("value"), part, ord).as("val_diff"),
            RowOrder.neighbor(col("event_type"), -1, lit("none"), part, ord)
              .as("prev_type"),
            RowOrder.neighbor(col("event_type"), 2, lit("END"), part, ord)
              .as("next2_type"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        WITH b AS (SELECT user_id, event_id, EPOCH_US(ts) AS us, value, event_type
                   FROM events)
        SELECT user_id, event_id,
          CASE WHEN LAG(value) OVER w IS NULL THEN 0.0
               ELSE value - LAG(value) OVER w END AS val_diff,
          COALESCE(LAG(event_type) OVER w, 'none') AS prev_type,
          COALESCE(LEAD(event_type, 2) OVER w, 'END') AS next2_type
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, event_id""")),

    // sequenceNextNode(backward, last_match): anchor on each user's LAST
    // click→purchase chain and read the node before it (BEGIN when the
    // chain starts the stream) — the mirror of the forward/first_match
    // query in SequenceQueries. Same single-window shape: the chain
    // match and the prior-node read share one sorted pass per user.
    QueryDef(
      "sequence_next_node_backward",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val wDesc = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .withColumn("p1", lag(col("event_type"), 1).over(w))
          .withColumn("p2", lag(col("event_type"), 2).over(w))
          .filter(col("event_type") === "purchase" && col("p1") === "click")
          .withColumn("rn", row_number().over(wDesc))
          .filter(col("rn") === 1)
          .groupBy(coalesce(col("p2"), lit("BEGIN")).as("prev_node"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("prev_node"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, EPOCH_US(ts) AS us, event_type,
            LAG(event_type, 1) OVER w AS p1,
            LAG(event_type, 2) OVER w AS p2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id)),
        m AS (
          SELECT p2,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
          FROM o WHERE event_type = 'purchase' AND p1 = 'click')
        SELECT COALESCE(p2, 'BEGIN') AS prev_node, COUNT(*) AS n_users
        FROM m WHERE rn = 1
        GROUP BY 1
        ORDER BY prev_node""")),

    // Time-rounding family + relative-epoch counters + dateName: all
    // floor onto the epoch grid, so the DuckDB oracle is integer
    // division of EPOCH_US. Codegen'd scalar math — no UDFs.
    QueryDef(
      "time_rounding_dialect",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            countDistinct(toStartOfFiveMinutes(ts)) AS n5m,
            countDistinct(toStartOfFifteenMinutes(ts)) AS n15m,
            countDistinct(timeSlot(ts)) AS n30m,
            countDistinct(toStartOfInterval(ts, INTERVAL 6 HOUR)) AS n6h,
            countDistinct(toStartOfInterval(ts, INTERVAL 3 MONTH)) AS nq,
            min(toStartOfInterval(ts, INTERVAL 5 MONTH)) AS grid5m,
            max(toRelativeDayNum(ts)) AS max_day,
            min(toRelativeHourNum(ts)) AS min_hour,
            min(dateName('month', ts)) AS first_month_name,
            max(dateName('weekday', ts)) AS max_weekday
          FROM events
          GROUP BY event_type
          ORDER BY event_type""")
      },
      Some("""
        SELECT event_type,
          COUNT(DISTINCT EPOCH_US(ts) // 300000000) AS n5m,
          COUNT(DISTINCT EPOCH_US(ts) // 900000000) AS n15m,
          COUNT(DISTINCT EPOCH_US(ts) // 1800000000) AS n30m,
          COUNT(DISTINCT EPOCH_US(ts) // 21600000000) AS n6h,
          COUNT(DISTINCT DATE_TRUNC('quarter', ts)) AS nq,
          MIN(CAST(MAKE_DATE(
            CAST(1970 + ((((YEAR(ts)-1970)*12 + MONTH(ts)-1)
              - (((YEAR(ts)-1970)*12 + MONTH(ts)-1) % 5)) // 12) AS INTEGER),
            CAST(((((YEAR(ts)-1970)*12 + MONTH(ts)-1)
              - (((YEAR(ts)-1970)*12 + MONTH(ts)-1) % 5)) % 12) + 1 AS INTEGER),
            1) AS TIMESTAMP)) AS grid5m,
          CAST(MAX(EPOCH_US(ts) // 86400000000) AS BIGINT) AS max_day,
          CAST(MIN(EPOCH_US(ts) // 3600000000) AS BIGINT) AS min_hour,
          MIN(MONTHNAME(ts)) AS first_month_name,
          MAX(DAYNAME(ts)) AS max_weekday
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // groupBit* aggregates + formatReadableSize over the same scan.
    QueryDef(
      "bitagg_readable_size",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_linestatus,
            groupBitAnd(l_orderkey) AS all_and,
            groupBitOr(l_orderkey) AS all_or,
            groupBitXor(l_orderkey) AS all_xor,
            formatReadableSize(max(CAST(FLOOR(l_extendedprice) AS BIGINT))) AS max_price_sz,
            formatReadableSize(min(CAST(FLOOR(l_extendedprice) AS BIGINT))) AS min_price_sz
          FROM lineitem
          GROUP BY l_linestatus
          ORDER BY l_linestatus""")
      },
      Some("""
        WITH t AS (SELECT l_linestatus, l_orderkey,
            CAST(FLOOR(l_extendedprice) AS BIGINT) AS p
          FROM lineitem),
        a AS (SELECT l_linestatus,
            BIT_AND(l_orderkey) AS all_and,
            BIT_OR(l_orderkey) AS all_or,
            BIT_XOR(l_orderkey) AS all_xor,
            CAST(MAX(p) AS DOUBLE) AS mxp, CAST(MIN(p) AS DOUBLE) AS mnp
          FROM t GROUP BY l_linestatus)
        SELECT l_linestatus, all_and, all_or, all_xor,
          CASE WHEN mxp < 1024 THEN PRINTF('%.2f B', mxp)
               WHEN mxp < 1048576 THEN PRINTF('%.2f KiB', mxp / 1024)
               ELSE PRINTF('%.2f MiB', mxp / 1048576) END AS max_price_sz,
          CASE WHEN mnp < 1024 THEN PRINTF('%.2f B', mnp)
               WHEN mnp < 1048576 THEN PRINTF('%.2f KiB', mnp / 1024)
               ELSE PRINTF('%.2f MiB', mnp / 1048576) END AS min_price_sz
        FROM a
        ORDER BY l_linestatus""")),

    // anyHeavy: the majority element per group (~80 % of quantities are
    // ≤ 40, so every group has a strict majority and the answer is
    // deterministic).
    QueryDef(
      "any_heavy_majority",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag,
            anyHeavy(CASE WHEN l_quantity <= 40 THEN 'small' ELSE 'big' END) AS heavy
          FROM lineitem
          GROUP BY l_returnflag
          ORDER BY l_returnflag""")
      },
      Some("""
        WITH c AS (SELECT l_returnflag,
            CASE WHEN l_quantity <= 40 THEN 'small' ELSE 'big' END AS v,
            COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, ARG_MAX(v, n) AS heavy
        FROM c
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))
  )
}
