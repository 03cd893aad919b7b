package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-5 wave: the reference's per-level funnel-breakdown family
  * (reference /root/reference/src/AggregateFunctions/
  * AggregateFunctionFinderFunnel.h — per-watch-slot funnel levels — and
  * AggregateFunctionFunnelRep.h — level arrays folded to per-slot
  * per-level user counts), plus the funnel-anchored pathSplit and cohort
  * retention variants that build on the same per-user event machinery.
  *
  * Scale shape shared by every query here: one shuffle on user_id into a
  * packed-buffer behavioral aggregate (concatenation merge, map-side
  * combine), then a small slot/level-keyed re-aggregation. No self-joins
  * of the event stream anywhere.
  */
object FunnelFamily {

  private val DayUs = 86400L * 1000000
  /** 2024-01-01 00:00:00 UTC in epoch-µs — the events table's first day. */
  private val WatchStartUs = 1704067200000000L
  private val WatchDays = 30

  private def steppedEvents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "events")
      .withColumn("step",
        when(col("event_type") === "signup", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).otherwise(0))
      .filter(col("step") > 0)

  val defs: Seq[QueryDef] = Seq(

    // finderFunnel + funnelRep: per-day funnel levels (chain must START in
    // the day; completion within a 1-day window may cross midnight —
    // the reference's "second chance" semantics), folded to per-day
    // per-level user counts (funnelRep's output matrix, one row per slot).
    QueryDef(
      "funnel_levels_breakdown",
      (s, dir) => {
        val ff = graft.aggregates.FinderFunnelAgg
          .finderFunnel(WatchStartUs, DayUs, WatchDays, DayUs, 3) _
        steppedEvents(s, dir)
          .groupBy(col("user_id"))
          .agg(ff(Tables.tsUs(col("ts")), col("step")).as("levels"))
          .select(col("user_id"), posexplode(col("levels")).as(Seq("slot", "lvl")))
          .filter(col("lvl") > 0)
          .groupBy(col("slot"))
          .agg(count(lit(1)).as("reached_1"),
               count(when(col("lvl") >= 2, 1)).as("reached_2"),
               count(when(col("lvl") >= 3, 1)).as("reached_3"))
          .orderBy(col("slot"))
      },
      // Exact oracle: per signup event, the earliest chain completion is
      // cp_next = min over clicks at-or-after it of (earliest purchase
      // at-or-after the click) — two window sweeps, no triple self-join
      // (same linearization as the funnel_signup_click_purchase oracle).
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'click' THEN us END) OVER w AS c_next,
                MIN(CASE WHEN event_type = 'click' THEN p_next END) OVER w AS cp_next
              FROM x
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        lv AS (SELECT user_id,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cp_next IS NOT NULL AND cp_next - us <= 86400000000 THEN 3
                      WHEN c_next IS NOT NULL AND c_next - us <= 86400000000 THEN 2
                      ELSE 1 END AS lvl
               FROM y WHERE event_type = 'signup'),
        m AS (SELECT user_id, slot, MAX(lvl) AS lvl FROM lv
              WHERE slot >= 0 AND slot < 30 GROUP BY 1, 2)
        SELECT slot, COUNT(*) AS reached_1,
          COUNT(CASE WHEN lvl >= 2 THEN 1 END) AS reached_2,
          COUNT(CASE WHEN lvl >= 3 THEN 1 END) AS reached_3
        FROM m GROUP BY slot ORDER BY slot""")),

    // finderFunnel at user granularity: every (user, day) funnel level —
    // the raw level arrays funnelRep consumes, posexploded so the gate
    // hash-checks each slot.
    QueryDef(
      "funnel_finder_user_levels",
      (s, dir) => {
        val ff = graft.aggregates.FinderFunnelAgg
          .finderFunnel(WatchStartUs, DayUs, WatchDays, DayUs, 3) _
        steppedEvents(s, dir)
          .groupBy(col("user_id"))
          .agg(ff(Tables.tsUs(col("ts")), col("step")).as("levels"))
          .select(col("user_id"), posexplode(col("levels")).as(Seq("slot", "lvl")))
          .filter(col("lvl") > 0)
          .orderBy(col("user_id"), col("slot"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'click' THEN us END) OVER w AS c_next,
                MIN(CASE WHEN event_type = 'click' THEN p_next END) OVER w AS cp_next
              FROM x
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        lv AS (SELECT user_id,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cp_next IS NOT NULL AND cp_next - us <= 86400000000 THEN 3
                      WHEN c_next IS NOT NULL AND c_next - us <= 86400000000 THEN 2
                      ELSE 1 END AS lvl
               FROM y WHERE event_type = 'signup'),
        m AS (SELECT user_id, slot, CAST(MAX(lvl) AS INTEGER) AS lvl FROM lv
              WHERE slot >= 0 AND slot < 30 GROUP BY 1, 2)
        SELECT user_id, slot, lvl FROM m ORDER BY user_id, slot""")),

    // funnelPathSplit: each user's deepest funnel session path — anchored
    // at a signup, every event (funnel or common) appended until the 2-day
    // window or depth 8 is hit, first max-level session wins. Posexploded
    // to (user, node position, event index, param) rows for the gate.
    QueryDef(
      "funnel_path_split",
      (s, dir) => {
        val fps = graft.aggregates.FunnelPathSplitAgg
          .funnelPathSplit(2 * DayUs, 8, 3) _
        Tables(s, dir, "events")
          .withColumn("idx",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3).otherwise(0))
          .groupBy(col("user_id"))
          .agg(fps(Tables.tsUs(col("ts")), col("idx"), col("event_type"))
            .as("path"))
          .select(col("user_id"), posexplode(col("path")).as(Seq("node_pos", "node")))
          .select(col("user_id"), col("node_pos"),
            col("node.ev").as("ev"), col("node.param").as("param"))
          .orderBy(col("user_id"), col("node_pos"))
      },
      // Oracle linearization: anchors are ALL signup events in stream
      // order (the reference's next_first_event chaining visits exactly
      // these); a session's slice is the next depth-1 events within the
      // window; greedy levels via first-step-2 position then a step-3
      // after it; first anchor with the max level wins.
      Some("""
        WITH e AS (
          SELECT user_id, EPOCH_US(ts) AS us,
            CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
                 WHEN 'purchase' THEN 3 ELSE 0 END AS idx,
            event_type AS param,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts,
              CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
                   WHEN 'purchase' THEN 3 ELSE 0 END, event_type) AS pos
          FROM events),
        a AS (SELECT user_id, us AS a_us, pos AS a_pos FROM e WHERE idx = 1),
        slice AS (
          SELECT a.user_id, a.a_pos, e.pos, e.idx, e.param
          FROM a JOIN e ON e.user_id = a.user_id
          WHERE e.pos >= a.a_pos AND e.pos < a.a_pos + 8
            AND e.us - a.a_us <= 172800000000),
        s2 AS (SELECT user_id, a_pos,
                 MIN(CASE WHEN idx = 2 AND pos > a_pos THEN pos END) AS p2
               FROM slice GROUP BY 1, 2),
        s3 AS (SELECT sl.user_id, sl.a_pos,
                 MIN(CASE WHEN sl.idx = 3 AND sl.pos > s2.p2 THEN sl.pos END) AS p3
               FROM slice sl
               JOIN s2 ON sl.user_id = s2.user_id AND sl.a_pos = s2.a_pos
               GROUP BY 1, 2),
        lev AS (SELECT s2.user_id, s2.a_pos,
                  1 + CASE WHEN s2.p2 IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.p3 IS NOT NULL THEN 1 ELSE 0 END AS lvl
                FROM s2 JOIN s3 ON s2.user_id = s3.user_id AND s2.a_pos = s3.a_pos),
        best AS (SELECT user_id, a_pos FROM lev
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY lvl DESC, a_pos) = 1)
        SELECT sl.user_id, CAST(sl.pos - sl.a_pos AS INTEGER) AS node_pos,
               sl.idx AS ev, sl.param
        FROM slice sl
        JOIN best b ON sl.user_id = b.user_id AND sl.a_pos = b.a_pos
        ORDER BY sl.user_id, node_pos""")),

    // attributionAnalysis time-decay mode (reference
    // AggregateFunctionAttributionAnalysis.h:563-580, attribution_mode 4:
    // per conversion each touch weighs 0.5^(Δt/halflife), normalized to
    // sum 1, then summed per touch channel with conversion counts and
    // credited value — the struct output of the analysis form).
    //
    // Plan: ONE window pass. 0.5^((t_p-t_c)/h) ∝ 2^(t_c/h), and the
    // purchase-anchored factor 2^(-t_p/h) cancels in the per-conversion
    // normalization, so each channel's credit is the RATIO of two sliding
    // 3-day window sums of per-touch weights. Weights are quantized to
    // integer micro-units BEFORE the window sum, making both the sum and
    // the ratio bit-deterministic (no double-accumulation order anywhere);
    // credit totals quantize per-term the same way (the repo's D6
    // convention). No purchase×touch join at any point.
    QueryDef(
      "attribution_time_decay",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val look = 3 * DayUs
        val e = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "view", "purchase"))
          .select(col("user_id"), Tables.tsUs(col("ts")).as("us"),
            col("event_type"), col("value"))
        // Half-life = 1 day; rebased exponent keeps 2^x in double range.
        val wmicro = floor(pow(lit(2.0),
          (col("us") - lit(WatchStartUs)) / lit(86400000000.0)) * lit(1e6))
          .cast("long")
        val win = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-look, 0)
        val wd = e
          .withColumn("wc", coalesce(
            sum(when(col("event_type") === "click", wmicro)).over(win), lit(0L)))
          .withColumn("wv", coalesce(
            sum(when(col("event_type") === "view", wmicro)).over(win), lit(0L)))
        val p = wd.filter(col("event_type") === "purchase" &&
          (col("wc") + col("wv")) > 0)
        val x = p.select(col("value"), explode(array(
            struct(lit("click").as("channel"), col("wc").as("wch"),
              (col("wc") + col("wv")).as("wtot")),
            struct(lit("view").as("channel"), col("wv").as("wch"),
              (col("wc") + col("wv")).as("wtot")))).as("t"))
          .select(col("t.channel").as("channel"), col("t.wch").as("wch"),
            col("t.wtot").as("wtot"), col("value"))
        val ratio = col("wch").cast("double") / col("wtot").cast("double")
        x.groupBy(col("channel")).agg(
            count(when(col("wch") > 0, 1)).as("conversions"),
            (sum(floor(lit(1e6) * ratio).cast("long")).cast("double") / 1e6)
              .as("credit"),
            (sum(floor(lit(1e6) * col("value") * ratio).cast("long"))
              .cast("double") / 1e6).as("value_credited"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type, value
                   FROM events
                   WHERE event_type IN ('click', 'view', 'purchase')),
        w AS (SELECT user_id, us, event_type, value,
                COALESCE(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(FLOOR(POWER(2.0, (us - 1704067200000000) / 86400000000.0)
                       * 1e6) AS BIGINT) END) OVER win, 0) AS wc,
                COALESCE(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(FLOOR(POWER(2.0, (us - 1704067200000000) / 86400000000.0)
                       * 1e6) AS BIGINT) END) OVER win, 0) AS wv
              FROM e
              WINDOW win AS (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW)),
        p AS (SELECT user_id, value, wc, wv FROM w
              WHERE event_type = 'purchase' AND wc + wv > 0),
        x AS (SELECT 'click' AS channel, wc AS wch, wc + wv AS wtot, value FROM p
              UNION ALL
              SELECT 'view', wv, wc + wv, value FROM p)
        SELECT channel,
          COUNT(CASE WHEN wch > 0 THEN 1 END) AS conversions,
          CAST(SUM(CAST(FLOOR(1e6 * (CAST(wch AS DOUBLE) / CAST(wtot AS DOUBLE)))
            AS BIGINT)) AS DOUBLE) / 1e6 AS credit,
          CAST(SUM(CAST(FLOOR(1e6 * value * (CAST(wch AS DOUBLE) / CAST(wtot AS DOUBLE)))
            AS BIGINT)) AS DOUBLE) / 1e6 AS value_credited
        FROM x GROUP BY channel ORDER BY channel""")),

    // attributionCorrelation (reference
    // AggregateFunctionAttributionCorrelation.h:243-327 getRankCorrelation
    // + insertResultInto): per touch channel — total/valid touch counts,
    // valid ratio, mean touch→conversion gap, and the Spearman rank
    // correlation (ties = averaged ranks, 1 - 6Σd²/(n(n²-1)), 0 when
    // Σy=0 or NaN) over per-user (total, valid) feature pairs, pairs
    // collected only from users with ≥1 valid touch anywhere (the
    // reference's has_valid merge guard). Composed from window passes —
    // no event-stream self-join; ranks are two window sorts per channel.
    QueryDef(
      "attribution_correlation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val look = 3 * DayUs
        val e = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "view", "purchase"))
          .select(col("user_id"), Tables.tsUs(col("ts")).as("us"),
            col("event_type"))
        val aheadWin = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(1, look)
        val t = e
          .withColumn("np",
            min(when(col("event_type") === "purchase", col("us"))).over(aheadWin))
          .filter(col("event_type").isin("click", "view"))
          .withColumn("valid", when(col("np").isNotNull, 1L).otherwise(0L))
          .withColumn("gap", when(col("np").isNotNull, col("np") - col("us")))
        val uc = t.groupBy(col("user_id"), col("event_type").as("channel"))
          .agg(count(lit(1)).as("total"), sum(col("valid")).as("valid"),
            sum(col("gap")).as("gap_us"))
        val pairs = uc.withColumn("has_valid",
            max(when(col("valid") > 0, 1).otherwise(0))
              .over(Window.partitionBy(col("user_id"))))
          .filter(col("has_valid") === 1)
        val ranked = pairs
          .withColumn("rnx", row_number().over(Window.partitionBy(col("channel"))
            .orderBy(col("total").desc, col("user_id"))))
          .withColumn("rny", row_number().over(Window.partitionBy(col("channel"))
            .orderBy(col("valid").desc, col("user_id"))))
          .withColumn("rx", avg(col("rnx"))
            .over(Window.partitionBy(col("channel"), col("total"))))
          .withColumn("ry", avg(col("rny"))
            .over(Window.partitionBy(col("channel"), col("valid"))))
        val corr = ranked.groupBy(col("channel")).agg(
            count(lit(1)).as("n"), sum(col("valid")).as("sumy"),
            sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("d2"))
          .select(col("channel"),
            when(col("sumy") === 0 || col("n") <= 1, lit(0.0))
              .otherwise(lit(1.0) - lit(6.0) * col("d2") /
                (col("n") * (col("n") * col("n") - 1))).as("correlation"))
        uc.groupBy(col("channel")).agg(
            sum(col("total")).as("clicks"), sum(col("valid")).as("valid_clicks"),
            sum(col("gap_us")).as("gap_sum"))
          .join(corr, Seq("channel"), "left")
          .select(col("channel"),
            coalesce(col("correlation"), lit(0.0)).as("correlation"),
            col("clicks"), col("valid_clicks"),
            (col("valid_clicks").cast("double") / col("clicks").cast("double"))
              .as("valid_ratio"),
            when(col("valid_clicks") > 0,
              col("gap_sum").cast("double") / col("valid_clicks") / lit(1e6))
              .otherwise(lit(0.0)).as("avg_gap_sec"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('click', 'view', 'purchase')),
        w AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 1 FOLLOWING AND 259200000000 FOLLOWING) AS np
              FROM e),
        t AS (SELECT user_id, event_type AS channel,
                CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END AS valid,
                CASE WHEN np IS NOT NULL THEN np - us END AS gap
              FROM w WHERE event_type IN ('click', 'view')),
        uc AS (SELECT user_id, channel, COUNT(*) AS total,
                 CAST(SUM(valid) AS BIGINT) AS valid,
                 CAST(SUM(gap) AS BIGINT) AS gap_us
               FROM t GROUP BY 1, 2),
        hv AS (SELECT *, MAX(CASE WHEN valid > 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id) AS has_valid FROM uc),
        rk AS (SELECT channel, user_id, total, valid,
                 ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY total DESC, user_id) AS rnx,
                 ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY valid DESC, user_id) AS rny
               FROM hv WHERE has_valid = 1),
        rr AS (SELECT channel, valid,
                 AVG(rnx) OVER (PARTITION BY channel, total) AS rx,
                 AVG(rny) OVER (PARTITION BY channel, valid) AS ry
               FROM rk),
        corr AS (SELECT channel, COUNT(*) AS n,
                   CAST(SUM(valid) AS BIGINT) AS sumy,
                   SUM((rx - ry) * (rx - ry)) AS d2
                 FROM rr GROUP BY channel),
        tot AS (SELECT channel, COUNT(*) AS clicks,
                  CAST(SUM(valid) AS BIGINT) AS valid_clicks,
                  CAST(SUM(gap) AS BIGINT) AS gap_sum
                FROM t GROUP BY channel)
        SELECT tot.channel,
          COALESCE(CASE WHEN corr.sumy = 0 OR corr.n <= 1 THEN 0.0
            ELSE 1.0 - 6.0 * corr.d2 / (corr.n * (corr.n * corr.n - 1)) END,
            0.0) AS correlation,
          tot.clicks, tot.valid_clicks,
          CAST(tot.valid_clicks AS DOUBLE) / CAST(tot.clicks AS DOUBLE)
            AS valid_ratio,
          CASE WHEN tot.valid_clicks > 0
            THEN CAST(tot.gap_sum AS DOUBLE) / tot.valid_clicks / 1e6
            ELSE 0.0 END AS avg_gap_sec
        FROM tot LEFT JOIN corr ON corr.channel = tot.channel
        ORDER BY tot.channel""")),

    // retentionLoss (reference AggregateFunctionRetentionLoss.h:93-126 +
    // finalize 158-162): per start-day cohort, lost(i,j) = users who
    // started on day i and had NOT returned by day j (first return
    // strictly after the start day, matching the reference's j=i+1 scan).
    // Scale shape: one user-day hash agg, then all matrix algebra runs on
    // the tiny (start_day, first_return) table — the day-grid explode
    // touches ≤ window² rows however many users exist.
    QueryDef(
      "retention_loss_matrix",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .as("dy"),
            col("event_type"))
          .groupBy(col("user_id"), col("dy"))
          .agg(max(when(col("event_type") === "signup", 1).otherwise(0)).as("st"),
               max(when(col("event_type") === "purchase", 1).otherwise(0)).as("rt"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("dy"))
          .rowsBetween(1, Window.unboundedFollowing)
        val c = d.withColumn("fr", min(when(col("rt") === 1, col("dy"))).over(w))
          .filter(col("st") === 1 && col("dy").between(0, 29))
        val g = c.groupBy(col("dy").as("i"), col("fr")).agg(count(lit(1)).as("cnt"))
        val coh = g.groupBy(col("i")).agg(sum(col("cnt")).as("cohort"))
        val grid = coh.select(col("i"), col("cohort"),
          explode(sequence(col("i"), lit(29))).as("j"))
        val ret = g.filter(col("fr").isNotNull)
          .select(col("i"), col("cnt"),
            explode(sequence(col("fr"), lit(29))).as("j"))
          .groupBy(col("i"), col("j")).agg(sum(col("cnt")).as("rn"))
        grid.join(ret, Seq("i", "j"), "left")
          .select(col("i").as("start_day"), col("j").as("day"), col("cohort"),
            (col("cohort") - coalesce(col("rn"), lit(0L))).as("lost"))
          .orderBy(col("start_day"), col("day"))
      },
      Some("""
        WITH d AS (SELECT user_id,
            CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS dy,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS st,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS rt
          FROM events GROUP BY 1, 2),
        w AS (SELECT user_id, dy, st,
                MIN(CASE WHEN rt = 1 THEN dy END) OVER
                  (PARTITION BY user_id ORDER BY dy
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fr
              FROM d),
        c AS (SELECT dy AS i, fr FROM w WHERE st = 1 AND dy BETWEEN 0 AND 29),
        g AS (SELECT i, fr, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
        coh AS (SELECT i, CAST(SUM(cnt) AS BIGINT) AS cohort FROM g GROUP BY i),
        grid AS (SELECT i, cohort, CAST(UNNEST(RANGE(i, 30)) AS INTEGER) AS j
                 FROM coh),
        ret AS (SELECT i, j, SUM(cnt) AS rn FROM (
                  SELECT i, cnt, CAST(UNNEST(RANGE(fr, 30)) AS INTEGER) AS j
                  FROM g WHERE fr IS NOT NULL) t
                GROUP BY 1, 2)
        SELECT grid.i AS start_day, grid.j AS day, grid.cohort,
               CAST(grid.cohort - COALESCE(ret.rn, 0) AS BIGINT) AS lost
        FROM grid LEFT JOIN ret ON grid.i = ret.i AND grid.j = ret.j
        ORDER BY start_day, day""")),

    // genArray (reference AggregateFunctionGenArray.h: per-user activity
    // bit array over the watch grid — the input feeding retention/loss).
    // 30 days pack into one BIGINT mask per flavor via bit_or.
    QueryDef(
      "retention_gen_array",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .as("dy"),
            col("event_type"))
          .filter(col("dy").between(0, 29))
          .groupBy(col("user_id"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), dy))").as("active_mask"),
            expr("bit_or(CASE WHEN event_type = 'signup' " +
              "THEN shiftleft(CAST(1 AS BIGINT), dy) ELSE CAST(0 AS BIGINT) END)")
              .as("signup_mask"),
            expr("bit_or(CASE WHEN event_type = 'purchase' " +
              "THEN shiftleft(CAST(1 AS BIGINT), dy) ELSE CAST(0 AS BIGINT) END)")
              .as("purchase_mask"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH d AS (SELECT user_id, event_type,
            CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS dy
          FROM events
          WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-30')
        SELECT user_id,
          BIT_OR(CAST(1 AS BIGINT) << dy) AS active_mask,
          BIT_OR(CASE WHEN event_type = 'signup' THEN CAST(1 AS BIGINT) << dy
                      ELSE CAST(0 AS BIGINT) END) AS signup_mask,
          BIT_OR(CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT) << dy
                      ELSE CAST(0 AS BIGINT) END) AS purchase_mask
        FROM d GROUP BY user_id ORDER BY user_id""")),

    // -OrderBy combinator: order-sensitive aggregates fed in explicit
    // (key, value) order — groupArrayOrderBy posexploded for the gate,
    // any/anyLast as first/last-by-key scalars.
    QueryDef(
      "agg_order_by_combinator",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT o_orderpriority, idx, price,
                 first_price, last_price
          FROM (
            SELECT o_orderpriority,
              groupArrayOrderBy(o_totalprice, o_orderdate) AS prices,
              anyOrderBy(o_totalprice, o_orderdate) AS first_price,
              anyLastOrderBy(o_totalprice, o_orderdate) AS last_price
            FROM orders
            WHERE o_totalprice > 400000
            GROUP BY o_orderpriority)
          LATERAL VIEW posexplode(prices) t AS idx, price
          ORDER BY o_orderpriority, idx""")
      },
      Some("""
        WITH g AS (
          SELECT o_orderpriority,
            LIST(o_totalprice ORDER BY o_orderdate, o_totalprice) AS prices
          FROM orders
          WHERE o_totalprice > 400000
          GROUP BY o_orderpriority)
        SELECT o_orderpriority,
          CAST(GENERATE_SUBSCRIPTS(prices, 1) - 1 AS INTEGER) AS idx,
          UNNEST(prices) AS price,
          prices[1] AS first_price,
          prices[-1] AS last_price
        FROM g
        ORDER BY o_orderpriority, idx"""))
  )
}
