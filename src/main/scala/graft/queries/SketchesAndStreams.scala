package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.aggregates.{BitmapAggregates => B, SumMap, TopK}
import graft.multimodal.Multimodal
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._

/** Bitmap set analytics, heavy hitters, HLL sketches, the streaming
  * pipeline, and multimodal plumbing — the reference capabilities beyond
  * plain SQL (SURVEY §2.4 sketch/bitmap groups, §2.10 streaming).
  */
object SketchesAndStreams {

  val defs: Seq[QueryDef] = Seq(
    // Bitmap set algebra on user sets: |click|, |purchase|, intersection,
    // union, difference — oracle = exact per-user boolean aggregation.
    QueryDef(
      "bitmap_user_overlap",
      (s, dir) => {
        // r15 (guide §2.3/§2.4): single-pass conditional bitmaps — one
        // events scan with two map-side-combined bitmap states replaces
        // two filtered scans + two global aggs + a crossJoin (2 scans /
        // 2 exchanges → 1 scan / 1 exchange). groupBitmapIf skips NULLs,
        // so `when(cond, user_id)` reproduces the filtered semantics
        // exactly.
        val ev = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
        ev.agg(
            B.groupBitmapIf(when(col("event_type") === "click", col("user_id")))
              .as("bm_click"),
            B.groupBitmapIf(when(col("event_type") === "purchase", col("user_id")))
              .as("bm_purchase"))
          .select(
          B.bitmapCardinality(col("bm_click")).as("n_click"),
          B.bitmapCardinality(col("bm_purchase")).as("n_purchase"),
          B.bitmapAndCardinality(col("bm_click"), col("bm_purchase")).as("n_both"),
          B.bitmapOrCardinality(col("bm_click"), col("bm_purchase")).as("n_either"),
          B.bitmapAndnotCardinality(col("bm_click"), col("bm_purchase")).as("n_click_only"))
      },
      Some("""
        WITH s AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
          FROM events GROUP BY user_id)
        SELECT CAST(SUM(c) AS BIGINT) AS n_click,
          CAST(SUM(p) AS BIGINT) AS n_purchase,
          CAST(SUM(c * p) AS BIGINT) AS n_both,
          CAST(SUM(CASE WHEN c = 1 OR p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_either,
          CAST(SUM(CASE WHEN c = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_click_only
        FROM s""")),

    // topK heavy hitters (SpaceSaving). Capacity >= NDV at test scale →
    // exact, so the oracle is the true top-10 by count (ties → lower id).
    QueryDef(
      "topk_users_by_events",
      (s, dir) => {
        val topk = TopK(10)
        Tables(s, dir, "events")
          .agg(topk(col("user_id")).as("top_users"))
          .select(posexplode(col("top_users")).as(Seq("pos", "user_id")))
          .select((col("pos") + 1).as("rank"), col("user_id"))
          .orderBy(col("rank"))
      },
      Some("""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS INTEGER) AS rank,
          user_id
        FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) t
        ORDER BY n DESC, user_id
        LIMIT 10""")),

    // HLL sketch (DataSketches, reference uniq/hllSketch family) — the
    // estimate is sketch-internal — pinned below, exact side recomputed.
    QueryDef(
      "hll_sketch_users",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"),
               countDistinct(col("user_id")).as("exact_users"))
          .orderBy(col("event_type")),
      // HYBRID oracle: exact_users recomputed by DuckDB; the
      // DataSketches HLL estimate column is pinned from the sf0.01 run
      // (deterministic; accuracy spec-gated). sf0.01 ONLY.
      Some("""
        SELECT e.event_type, CAST(v.hll_users AS BIGINT) AS hll_users,
          COUNT(DISTINCT e.user_id) AS exact_users
        FROM events e JOIN (VALUES
          ('click',150), ('error',150), ('purchase',150), ('signup',150), ('view',150)) AS v(event_type, hll_users) ON e.event_type = v.event_type
        GROUP BY e.event_type, v.hll_users
        ORDER BY e.event_type""")),

    // Theta sketch distinct (TypedImperativeAggregate over DataSketches;
    // reference thetaSketch family). Estimate is sketch-internal →
    // rows-only; accuracy asserted in unit tests.
    QueryDef(
      "theta_sketch_users",
      // oracle-checked: below 2^lgK retained hashes a theta sketch is an
      // exact set, and the per-type user counts here are far under the
      // 4096 threshold — the estimate IS count-distinct, so DuckDB
      // verifies both columns bit-exactly
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(graft.aggregates.SketchAggregates.thetaDistinct(col("user_id"))
              .cast("long").as("theta_users"),
               countDistinct(col("user_id")).as("exact_users"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
          COUNT(DISTINCT user_id) AS theta_users,
          COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // KLL quantile sketch (reference kllSketch family). The sketch's
    // chosen values depend on compaction order, so the gate checks the
    // sketch's ACCURACY CONTRACT instead: the realized rank of each
    // estimate must sit within the KLL error bound of its target
    // quantile (k=200 → ~1.65% normalized rank error; 5% budget). The
    // booleans + group counts hash against the oracle, which asserts
    // them true — a broken sketch flips a boolean and fails the hash.
    QueryDef(
      "kll_value_quantiles",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val q = ev.groupBy(col("event_type"))
          .agg(graft.aggregates.SketchAggregates.kllQuantile(col("value"), 0.5).as("kll_p50"),
               graft.aggregates.SketchAggregates.kllQuantile(col("value"), 0.9).as("kll_p90"))
        ev.join(broadcast(q), "event_type")
          .groupBy(col("event_type"), col("kll_p50"), col("kll_p90"))
          .agg(count(lit(1)).as("n"),
               sum(when(col("value") <= col("kll_p50"), 1L).otherwise(0L)).as("le50"),
               sum(when(col("value") <= col("kll_p90"), 1L).otherwise(0L)).as("le90"))
          .select(col("event_type"), col("n"),
            (abs(col("le50") / col("n") - 0.5) <= 0.05).as("p50_in_bound"),
            (abs(col("le90") / col("n") - 0.9) <= 0.05).as("p90_in_bound"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
          TRUE AS p50_in_bound, TRUE AS p90_in_bound
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Streaming tumbling-window counts (AvailableNow over the same data) —
    // oracle identical to the batch bucketing, proving stream/batch parity.
    QueryDef(
      "stream_tumbling_counts",
      (s, dir) =>
        StreamingPipeline.tumblingCounts(s, dir, s"stream_tumbling_${System.nanoTime()}")
          .orderBy(col("bucket"), col("event_type")),
      Some("""
        SELECT MAKE_TIMESTAMP((EPOCH_US(ts) // 21600000000) * 21600000000) AS bucket,
          event_type, COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket, event_type""")),

    // Stateful streaming: per-user running counters via
    // flatMapGroupsWithState; with AvailableNow over static data the final
    // state equals the batch aggregate (the oracle).
    QueryDef(
      "stream_stateful_counts",
      (s, dir) =>
        StreamingPipeline.statefulUserCounts(s, dir, s"stream_state_${System.nanoTime()}")
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // Incremental windowFunnel in the state store (flatMapGroupsWithState,
    // window-bounded eviction + carried best level) — per-user levels
    // must match the batch funnel's linear-window oracle exactly.
    QueryDef(
      "stream_funnel_levels",
      (s, dir) =>
        StreamingPipeline.streamingFunnel(s, dir,
            s"stream_funnel_${System.nanoTime()}",
            windowUs = 7L * 86400 * 1000000,
            steps = Seq("signup", "click", "purchase"))
          .orderBy(col("user_id")),
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        w1 AS (
          SELECT user_id, us, event_type,
            MAX(CASE WHEN event_type = 'signup' THEN us END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_s
          FROM e),
        w2 AS (
          SELECT user_id, us, event_type, run_s,
            MAX(CASE WHEN event_type = 'click' THEN run_s END) OVER
              (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sc
          FROM w1),
        f AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS d1,
            MAX(CASE WHEN event_type = 'click' AND run_s IS NOT NULL
                     AND us - run_s <= 604800000000 THEN 1 ELSE 0 END) AS d2,
            MAX(CASE WHEN event_type = 'purchase' AND run_sc IS NOT NULL
                     AND us - run_sc <= 604800000000 THEN 1 ELSE 0 END) AS d3
          FROM w2 GROUP BY user_id)
        SELECT user_id, d1 + d2 + d3 AS level
        FROM f ORDER BY user_id""")),

    // Streaming session windows (session_window + watermark, AvailableNow
    // over static data) — oracle identical to the batch gap-split.
    QueryDef(
      "stream_session_counts",
      (s, dir) =>
        StreamingPipeline.sessionCounts(s, dir, s"stream_session_${System.nanoTime()}")
          .orderBy(col("user_id"), col("session_start_us")),
      Some("""
        WITH marked AS (
          SELECT user_id, EPOCH_US(ts) AS us,
            CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w >= 1800000000 THEN 1
                 WHEN LAG(EPOCH_US(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
        FROM (SELECT user_id, us,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM marked) t
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start_us""")),

    // Streaming sessionAnalysis: the batch operator's per-session
    // (duration, depth, end event, session time) tuples computed by the
    // watermarked session_window state store — must match the batch
    // lag+cumulative-break oracle exactly (same gap − 1 µs boundary).
    QueryDef(
      "stream_session_tuples",
      (s, dir) =>
        StreamingPipeline.sessionTuples(s, dir, s"stream_sess_tup_${System.nanoTime()}")
          .orderBy(col("user_id"), col("session_time_us")),
      Some("""
        WITH b AS (
          SELECT user_id, ts, event_type,
            CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)),
        g AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_type
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM b)
        SELECT user_id, epoch_us(MIN(ts)) AS session_time_us,
          epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
          COUNT(*) AS depth,
          substr(MAX(concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
            ':', event_type)), 22) AS end_event
        FROM g GROUP BY user_id, sid
        ORDER BY user_id, session_time_us""")),

    // sumMap: per-user map of event_type → summed value (Map-combinator
    // family). Map scalar functions probe the result; oracle = equivalent
    // conditional aggregation.
    QueryDef(
      "summap_user_values",
      (s, dir) => {
        val sm = SumMap()
        Tables(s, dir, "events")
          .withColumn("v6", col("value").cast(Num.D6).cast("double"))
          .groupBy(col("user_id"))
          .agg(sm(col("event_type"), col("v6")).as("m"))
          .select(col("user_id"),
                  size(map_keys(col("m"))).as("n_types"),
                  round(coalesce(element_at(col("m"), "click"), lit(0.0)), 6).as("click_value"),
                  round(coalesce(element_at(col("m"), "purchase"), lit(0.0)), 6).as("purchase_value"),
                  round(aggregate(map_values(col("m")), lit(0.0).cast(Num.D6),
                    (acc, x) => (acc + x.cast(Num.D6)).cast(Num.D6)).cast("double"), 6)
                    .as("total_value"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
          CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types,
          ROUND(CAST(SUM(CASE WHEN event_type = 'click'
            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE), 6) AS click_value,
          ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE), 6) AS purchase_value,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // Multimodal plumbing: binary payload + metadata + stub feature
    // extraction (hybrid oracle below; the decode is a documented fake).
    QueryDef(
      "multimodal_features",
      (s, dir) => {
        val media = Multimodal.withFakeMedia(Tables(s, dir, "documents"), "doc_id", "text")
        media
          .withColumn("features", Multimodal.fakeDecodeFeatures(col("media"), 8))
          .withColumn("frames", Multimodal.sampleFrames(col("media"), 3, 16))
          .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
                  round(element_at(col("features"), 1), 6).as("f0"),
                  size(col("frames")).as("n_frames"))
          .orderBy(col("media_id"))
          .limit(100)
      },
      // HYBRID oracle: media_id / n_bytes / n_frames are SQL-derivable
      // from documents (same derivation multimodal_metadata hash-checks);
      // only the deterministic stub-decode feature f0 is pinned per
      // media_id from the sf0.01 run. sf0.01 ONLY.
      Some("""
        SELECT d.doc_id AS media_id, CAST(LENGTH(d.text) AS INTEGER) AS n_bytes,
          CAST(v.f0 AS DOUBLE) AS f0, 3 AS n_frames
        FROM documents d JOIN (VALUES
          (0,0.885484), (1,-0.660112), (2,0.20907), (3,0.191629), (4,-0.906901), (5,0.082773),
          (6,0.69327), (7,0.162872), (8,0.569035), (9,0.797204), (10,-0.071696), (11,0.132884),
          (12,0.853469), (13,-0.052072), (14,-0.620996), (15,-0.923866), (16,0.86642), (17,0.753108),
          (18,0.947043), (19,-0.774132), (20,-0.979035), (21,-0.131352), (22,-0.364508), (23,0.09614),
          (24,0.747467), (25,-0.691266), (26,0.932632), (27,-0.162775), (28,-0.909227), (29,-0.650759),
          (30,-0.335257), (31,0.085806), (32,0.651009), (33,0.15233), (34,-0.100939), (35,-0.187781),
          (36,0.753441), (37,-0.437693), (38,0.496913), (39,-0.448864), (40,0.070242), (41,-0.655592),
          (42,-0.996763), (43,-0.530181), (44,-0.508124), (45,0.767029), (46,0.163674), (47,-0.39704),
          (48,-0.194966), (49,-0.203443), (50,-0.113262), (51,0.190698), (52,-0.708185), (53,-0.189863),
          (54,-0.140165), (55,-0.652363), (56,-0.21878), (57,0.515817), (58,-0.358649), (59,0.384941),
          (60,0.657747), (61,0.921125), (62,-0.007827), (63,0.702822), (64,0.660449), (65,0.962129),
          (66,-0.565111), (67,-0.749721), (68,-0.623059), (69,-0.429893), (70,-0.442465), (71,0.047005),
          (72,0.38765), (73,-0.090059), (74,0.013335), (75,-0.287416), (76,-0.15541), (77,0.741661),
          (78,0.050292), (79,0.236479), (80,-0.943414), (81,-0.187003), (82,0.298238), (83,0.728751),
          (84,-0.035605), (85,-0.595222), (86,-0.2582), (87,-0.747678), (88,-0.158001), (89,-0.374901),
          (90,-0.424081), (91,0.273547), (92,0.720168), (93,-0.550311), (94,-0.433347), (95,-0.584608),
          (96,0.276713), (97,-0.600913), (98,0.384084), (99,-0.885884)) AS v(media_id, f0) ON d.doc_id = v.media_id
        ORDER BY media_id""")),

    // SQL-expressible half of the multimodal pipeline: the metadata
    // struct and frame-sampling arity are deterministic functions of the
    // payload, so they hash-check against the oracle even though the
    // decode stub's feature values can't.
    QueryDef(
      "multimodal_metadata",
      (s, dir) => {
        val media = Multimodal.withFakeMedia(Tables(s, dir, "documents"), "doc_id", "text")
        media
          .withColumn("frames", Multimodal.sampleFrames(col("media"), 3, 16))
          .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
                  col("meta.format").as("format"),
                  size(col("frames")).as("n_frames"))
          .orderBy(col("media_id"))
          .limit(100)
      },
      Some("""
        SELECT doc_id AS media_id,
          CAST(LENGTH(text) AS INTEGER) AS n_bytes,
          'fake/raw' AS format,
          3 AS n_frames
        FROM documents
        ORDER BY media_id
        LIMIT 100"""))
  )
}
