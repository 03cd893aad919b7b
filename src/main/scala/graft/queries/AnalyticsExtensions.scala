package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Reference aggregate families beyond the round-1 set, each re-expressed
  * as composed Spark built-ins (SURVEY §2.4 low-priority groups):
  * deltaSum / intervalLengthSum / boundingRatio / histogram / entropy /
  * simpleLinearRegression (/root/reference/src/AggregateFunctions/
  * AggregateFunctionDeltaSum.cpp, …IntervalLengthSum.cpp,
  * …BoundingRatio.cpp, …Histogram.cpp, …Entropy.cpp,
  * …SimpleLinearRegression.cpp), path analytics (…PathSplit.cpp),
  * groupArrayMovingSum (…GroupArrayMoving.cpp), ORDER BY … WITH FILL
  * INTERPOLATE (/root/reference/src/Processors/Transforms/
  * FillingTransform.cpp), map/IP scalar families, and the -State/-Merge
  * combinator pattern via Spark's HLL sketch state columns.
  *
  * Scale notes: every aggregate here is a hash or window aggregate on the
  * natural key (user_id / event_type) — partial aggregation combines
  * map-side, windows shuffle once on their partition key. The two global
  * windows (fill interpolation) run on a 30-row axis, not the fact table.
  */
object AnalyticsExtensions {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    // deltaSum: sum of positive deltas between consecutive values.
    QueryDef(
      "agg_delta_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("d", col("value") - lag(col("value"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(dsum6(when(col("d") > 0, col("d")).otherwise(lit(0.0))).as("delta_sum"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
          CAST(SUM(CAST(CASE WHEN d > 0 THEN d ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
            AS delta_sum
        FROM (SELECT user_id,
                value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
              FROM events) t
        GROUP BY user_id
        ORDER BY user_id""")),

    // intervalLengthSum: length of the union of [ts, ts+10min) intervals
    // per user — sweep-line via a running-max window, all integer µs.
    QueryDef(
      "agg_interval_union",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .select(col("user_id"), Tables.tsUs(col("ts")).as("st"))
          .withColumn("en", col("st") + lit(600000000L))
          .withColumn("pm", max(col("en")).over(w))
          .withColumn("covered",
            greatest(lit(0L), col("en") - greatest(col("st"), coalesce(col("pm"), lit(0L)))))
          .groupBy(col("user_id"))
          .agg(sum(col("covered")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH iv AS (SELECT user_id, EPOCH_US(ts) AS st, EPOCH_US(ts) + 600000000 AS en
                    FROM events),
        m AS (SELECT user_id, st, en,
                MAX(en) OVER (PARTITION BY user_id ORDER BY st, en
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
              FROM iv)
        SELECT user_id,
          CAST(SUM(GREATEST(0, en - GREATEST(st, COALESCE(pm, 0)))) AS BIGINT) AS covered_us
        FROM m
        GROUP BY user_id
        ORDER BY user_id""")),

    // boundingRatio: slope between the first and last point of each
    // group, (last y - first y) / x span in days.
    QueryDef(
      "agg_bounding_ratio",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_type"), col("value"), Tables.tsUs(col("ts")).as("us"),
                  col("event_id"))
          .groupBy(col("event_type"))
          .agg(max_by(col("value"), struct(col("us"), col("event_id"))).as("y_last"),
               min_by(col("value"), struct(col("us"), col("event_id"))).as("y_first"),
               max(col("us")).as("x_max"), min(col("us")).as("x_min"))
          .select(col("event_type"),
            ((col("y_last") - col("y_first")) /
              ((col("x_max") - col("x_min")).cast(DoubleType) / lit(86400000000.0)))
              .as("bounding_ratio"))
          .orderBy(col("event_type")),
      Some("""
        WITH e AS (SELECT event_type, value, EPOCH_US(ts) AS us, event_id FROM events),
        r AS (SELECT event_type, value, us,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY us, event_id) AS ra,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY us DESC, event_id DESC) AS rd
              FROM e)
        SELECT event_type,
          (MAX(CASE WHEN rd = 1 THEN value END) - MAX(CASE WHEN ra = 1 THEN value END))
            / ((MAX(us) - MIN(us)) / 86400000000.0) AS bounding_ratio
        FROM r
        GROUP BY event_type
        ORDER BY event_type""")),

    // entropy: Shannon entropy of the per-user event distribution within
    // each event_type; terms quantized to 9 decimals before the exact sum.
    QueryDef(
      "agg_entropy",
      (s, dir) => {
        val c = Tables(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val t = c.groupBy(col("event_type")).agg(sum(col("n")).cast(DoubleType).as("tot"))
        c.join(t, "event_type")
          .withColumn("p", col("n") / col("tot"))
          .withColumn("term", (col("p") * log(col("p"))).cast(DecimalType(18, 9)))
          .groupBy(col("event_type"))
          .agg((sum(col("term")).cast(DoubleType) * lit(-1.0)).as("entropy"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH c AS (SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(SUM(n) AS DOUBLE) AS tot FROM c GROUP BY 1)
        SELECT c.event_type,
          CAST(SUM(CAST((n / tot) * LN(n / tot) AS DECIMAL(18,9))) AS DOUBLE) * -1.0
            AS entropy
        FROM c JOIN t ON c.event_type = t.event_type
        GROUP BY c.event_type
        ORDER BY c.event_type""")),

    // histogram: 10 equal-width value bins per event_type (the reference's
    // adaptive histogram re-expressed as fixed-width bucketing).
    QueryDef(
      "agg_histogram",
      (s, dir) => {
        val stats = Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        Tables(s, dir, "events")
          .join(broadcast(stats), "event_type")
          .withColumn("bin",
            least(floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0))),
                  lit(9L)).cast("int"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some("""
        WITH s AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
                   FROM events GROUP BY 1)
        SELECT e.event_type,
          CAST(LEAST(FLOOR((value - mn) / ((mx - mn) / 10.0)), 9) AS INTEGER) AS bin,
          COUNT(*) AS n
        FROM events e JOIN s ON e.event_type = s.event_type
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // simpleLinearRegression: closed-form least squares of value vs time
    // (days since 2024-01-01) from exact decimal moment sums, so both
    // engines derive slope/intercept from bit-identical doubles.
    QueryDef(
      "agg_linear_regression",
      (s, dir) => {
        val base = Tables(s, dir, "events")
          .select(col("event_type"),
            ((Tables.tsUs(col("ts")) - lit(1704067200000000L)).cast(DoubleType) /
              lit(86400000000.0)).as("x"),
            col("value").as("y"))
        val m = base.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(18, 9))).cast(DoubleType).as("sx"),
          sum(col("y").cast(DecimalType(18, 6))).cast(DoubleType).as("sy"),
          sum((col("x") * col("y")).cast(DecimalType(18, 6))).cast(DoubleType).as("sxy"),
          sum((col("x") * col("x")).cast(DecimalType(18, 9))).cast(DoubleType).as("sxx"))
        val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))
        m.select(col("event_type"), graft.Num.dq6(slope).as("slope"),
            graft.Num.dq6((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH p AS (SELECT event_type,
                     (EPOCH_US(ts) - 1704067200000000) / 86400000000.0 AS x,
                     value AS y
                   FROM events),
        m AS (SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(x * x AS DECIMAL(18,9))) AS DOUBLE) AS sxx
              FROM p GROUP BY 1)
        SELECT event_type,
          CAST(CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
            AS DECIMAL(18,6)) AS DOUBLE) AS slope,
          CAST(CAST(ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
            AS DECIMAL(18,6)) AS DOUBLE) AS intercept
        FROM m
        ORDER BY event_type""")),

    // pathSplit/pathCount analogue: event-type transition bigram counts
    // over each user's time-ordered stream.
    QueryDef(
      "path_transition_counts",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("prev_et", lag(col("event_type"), 1).over(w))
          .filter(col("prev_et").isNotNull)
          .groupBy(col("prev_et"), col("event_type").as("next_et"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prev_et"), col("next_et"))
      },
      Some("""
        SELECT prev_et, event_type AS next_et, COUNT(*) AS n
        FROM (SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_et
              FROM events) t
        WHERE prev_et IS NOT NULL
        GROUP BY 1, 2
        ORDER BY prev_et, next_et""")),

    // groupArrayMovingSum: per-user array of 3-row moving sums in stream
    // order (exact decimal window sums, so array elements are bit-equal).
    QueryDef(
      "agg_moving_array",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(-2, 0)
        Tables(s, dir, "events")
          .select(col("user_id"), Tables.tsUs(col("ts")).as("us"), col("event_id"),
                  col("value"))
          .withColumn("m", sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("m")))).as("s"))
          .select(col("user_id"), expr("transform(s, x -> x.m)").as("moving_sum3"))
          // The array IS the operator's output; posexplode it back to scalar
          // rows so the driver's hash-compare (which can't hash array cells)
          // can verify every element positionally.
          .select(col("user_id"), posexplode(col("moving_sum3")).as(Seq("idx", "moving_sum")))
          .orderBy(col("user_id"), col("idx"))
      },
      Some("""
        WITH b AS (SELECT user_id, EPOCH_US(ts) AS us, event_id, value FROM events),
        m AS (SELECT user_id, us, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                  PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv
              FROM b)
        SELECT user_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) - 1 AS INT) AS idx,
          mv AS moving_sum
        FROM m
        ORDER BY user_id, idx""")),

    // ORDER BY ... WITH FILL INTERPOLATE: daily grid over January, gaps
    // linearly interpolated between the surrounding known points (edge
    // gaps take the nearest known value).
    QueryDef(
      "orderby_fill_interpolate",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .filter(col("event_type") === "error" && col("value") > 485)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(dsum2(col("value")).as("s"))
        val axis = s.sql(
          "SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00', " +
            "TIMESTAMP '2024-01-30 00:00:00', interval 1 day)) AS day")
        val wPrev = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
        val wNext = Window.orderBy(col("day")).rowsBetween(0, Window.unboundedFollowing)
        axis.join(daily, Seq("day"), "left")
          .withColumn("ps", last(col("s"), ignoreNulls = true).over(wPrev))
          .withColumn("pd", last(when(col("s").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
          .withColumn("ns", first(col("s"), ignoreNulls = true).over(wNext))
          .withColumn("nd", first(when(col("s").isNotNull, col("day")), ignoreNulls = true).over(wNext))
          .select(col("day"),
            when(col("s").isNotNull, col("s"))
              .when(col("ps").isNull, col("ns"))
              .when(col("ns").isNull, col("ps"))
              .otherwise(col("ps") + (col("ns") - col("ps")) *
                ((Tables.tsUs(col("day")) - Tables.tsUs(col("pd"))).cast(DoubleType) /
                  (Tables.tsUs(col("nd")) - Tables.tsUs(col("pd"))).cast(DoubleType)))
              .as("filled"))
          .orderBy(col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
          FROM events WHERE event_type = 'error' AND value > 485
          GROUP BY 1),
        axis AS (SELECT UNNEST(GENERATE_SERIES(
            TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
        j AS (SELECT axis.day AS day, s FROM axis LEFT JOIN daily ON axis.day = daily.day),
        f AS (SELECT day, s,
                LAST_VALUE(s IGNORE NULLS) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
                LAST_VALUE(CASE WHEN s IS NOT NULL THEN day END IGNORE NULLS) OVER (
                  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                FIRST_VALUE(s IGNORE NULLS) OVER (ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns,
                FIRST_VALUE(CASE WHEN s IS NOT NULL THEN day END IGNORE NULLS) OVER (
                  ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
              FROM j)
        SELECT day,
          CASE WHEN s IS NOT NULL THEN s
               WHEN ps IS NULL THEN ns
               WHEN ns IS NULL THEN ps
               ELSE ps + (ns - ps) * ((EPOCH_US(day) - EPOCH_US(pd))
                 / CAST(EPOCH_US(nd) - EPOCH_US(pd) AS DOUBLE))
          END AS filled
        FROM f
        ORDER BY day""")),

    // Map-type operations: per-user event_type→count map built with
    // map_from_entries, probed with element_at / map_contains_key /
    // map_keys (reference src/Functions/map.cpp family).
    QueryDef(
      "map_functions",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
            .as("m"))
          .select(col("user_id"),
            size(col("m")).as("n_types"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("click_n"),
            map_contains_key(col("m"), "error").as("has_error"),
            array_join(map_keys(col("m")), ",").as("type_list"))
          .orderBy(col("user_id")),
      Some("""
        WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
        SELECT user_id,
          CAST(COUNT(*) AS INTEGER) AS n_types,
          CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT)
            AS click_n,
          BOOL_OR(event_type = 'error') AS has_error,
          STRING_AGG(event_type, ',' ORDER BY event_type) AS type_list
        FROM c
        GROUP BY user_id
        ORDER BY user_id""")),

    // IPv4 string↔number conversions (reference src/Functions/
    // FunctionsCoding.cpp IPv4NumToString/IPv4StringToNum family) via
    // split + integer arithmetic with a roundtrip check.
    QueryDef(
      "ip_functions",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("user_id")).distinct()
          .withColumn("ip", concat_ws(".", lit(10), pmod(col("user_id"), lit(256)),
            pmod(col("user_id") * 7, lit(256)), pmod(col("user_id") * 13, lit(256))))
          .withColumn("o", split(col("ip"), "\\."))
          .withColumn("ip_num",
            element_at(col("o"), 1).cast("long") * 16777216L +
              element_at(col("o"), 2).cast("long") * 65536L +
              element_at(col("o"), 3).cast("long") * 256L +
              element_at(col("o"), 4).cast("long"))
          .withColumn("rt", concat_ws(".",
            expr("(ip_num div 16777216) % 256"), expr("(ip_num div 65536) % 256"),
            expr("(ip_num div 256) % 256"), expr("ip_num % 256")))
          .select(col("user_id"), col("ip"), col("ip_num"),
                  (col("rt") === col("ip")).as("roundtrip_ok"))
          .orderBy(col("user_id")),
      Some("""
        WITH d AS (SELECT DISTINCT user_id FROM events),
        i AS (SELECT user_id,
                '10.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
                  CAST((user_id * 7) % 256 AS VARCHAR) || '.' ||
                  CAST((user_id * 13) % 256 AS VARCHAR) AS ip
              FROM d),
        n AS (SELECT user_id, ip,
                CAST(SPLIT_PART(ip, '.', 1) AS BIGINT) * 16777216 +
                CAST(SPLIT_PART(ip, '.', 2) AS BIGINT) * 65536 +
                CAST(SPLIT_PART(ip, '.', 3) AS BIGINT) * 256 +
                CAST(SPLIT_PART(ip, '.', 4) AS BIGINT) AS ip_num
              FROM i)
        SELECT user_id, ip, ip_num,
          (CAST((ip_num // 16777216) % 256 AS VARCHAR) || '.' ||
            CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
            CAST((ip_num // 256) % 256 AS VARCHAR) || '.' ||
            CAST(ip_num % 256 AS VARCHAR)) = ip AS roundtrip_ok
        FROM n
        ORDER BY user_id""")),

    // Nested(...) ≡ array<struct<...>> (SURVEY §1.2): per-order item
    // arrays built with collect_list(struct(...)), then filtered/probed
    // with higher-order functions. Scalar outputs so the oracle can
    // compute the same facts flat.
    QueryDef(
      "nested_struct_ops",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(col("l_linenumber").as("ln"),
            col("l_quantity").as("qty")))).as("items"))
          .select(col("l_orderkey"),
            size(col("items")).as("n_items"),
            size(expr("filter(items, x -> x.qty > 40)")).as("n_heavy"),
            expr("exists(items, x -> x.ln = 1)").as("has_line1"),
            expr("CAST(aggregate(items, CAST(0.0 AS DECIMAL(18,2)), (acc, x) -> " +
              "CAST(acc + CAST(x.qty AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE)")
              .as("sum_qty"))
          .groupBy(col("has_line1"))
          .agg(count(lit(1)).as("n_orders"),
               sum(col("n_items")).as("total_items"),
               sum(col("n_heavy")).as("total_heavy"),
               sum(col("sum_qty").cast(Num.D2)).cast("double").as("total_qty"))
          .orderBy(col("has_line1")),
      Some("""
        WITH per_order AS (
          SELECT l_orderkey, COUNT(*) AS n_items,
            CAST(COUNT(CASE WHEN l_quantity > 40 THEN 1 END) AS INTEGER) AS n_heavy,
            BOOL_OR(l_linenumber = 1) AS has_line1,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey)
        SELECT has_line1, COUNT(*) AS n_orders,
          CAST(SUM(n_items) AS BIGINT) AS total_items,
          CAST(SUM(n_heavy) AS BIGINT) AS total_heavy,
          CAST(SUM(CAST(sum_qty AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM per_order
        GROUP BY has_line1
        ORDER BY has_line1""")),

    // -State/-Merge combinator parity (SURVEY §1.2 AggregateFunction
    // columns): daily HLL sketch states per event_type, merged across
    // days with hll_union_agg — sketch internals have no SQL oracle, so
    // this entry is rows-only checked.
    QueryDef(
      "hll_state_merge",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("state"))
          .groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_union_agg(col("state"))).as("approx_users"),
               count(lit(1)).as("n_partials"))
          .orderBy(col("event_type")),
      // HYBRID oracle: n_partials (distinct days per type) is genuinely
      // recomputed by DuckDB; only the merged-HLL estimate is pinned from
      // the sf0.01 run (deterministic — register merges are max-commutative;
      // verified stable across local[4]/local[8]). sf0.01 ONLY.
      Some("""
        SELECT e.event_type, CAST(v.approx_users AS BIGINT) AS approx_users,
          COUNT(DISTINCT DATE_TRUNC('day', e.ts)) AS n_partials
        FROM events e JOIN (VALUES
          ('click',150), ('error',150), ('purchase',150), ('signup',150), ('view',150)
        ) AS v(event_type, approx_users) ON e.event_type = v.event_type
        GROUP BY e.event_type, v.approx_users
        ORDER BY e.event_type"""))
  )
}
