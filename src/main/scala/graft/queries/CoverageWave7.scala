package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Association, Sparkbar, StatTests}
import graft.aggregates.TimeOrderedAggregates
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage wave: the cross-tab association statistics
  * (cramersV / cramersVBiasCorrected / theilsU / contingency, reference
  * CrossTab.h), categoricalInformationValue, and the remaining
  * miscellaneous aggregate spellings (avgWeighted, sumCount,
  * singleValueOrNull, groupConcat, exponentialMovingAverage,
  * -SimpleState).
  *
  * Scale notes: the association statistics make exactly one pass over
  * the fact table (groupBy(a,b).count) and do all statistic math on the
  * distinct-pairs cells table, so the shuffle volume is the pair
  * cardinality, not the row count. The misc aggregates are single hash
  * aggregates with map-side partials.
  */
object CoverageWave7 {

  val defs: Seq[QueryDef] = Seq(

    // cramersV / cramersVBiasCorrected / theilsU / contingency over the
    // (lang, source) pair of the documents table — all four from the one
    // shared cross-tab pass, mirroring the reference's shared
    // CrossTabData state.
    QueryDef(
      "assoc_crosstab_stats",
      (s, dir) =>
        Association.crossTabStats(
          Tables(s, dir, "documents"), col("lang"), col("source")),
      Some("""
        WITH cells AS (
          SELECT lang AS a, source AS b, COUNT(*) AS nab
          FROM documents GROUP BY 1, 2
        ),
        marg AS (
          SELECT a, b, nab,
            SUM(nab) OVER (PARTITION BY a) AS na,
            SUM(nab) OVER (PARTITION BY b) AS nb,
            SUM(nab) OVER () AS n,
            ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn_a
          FROM cells
        ),
        sums AS (
          SELECT CAST(MAX(n) AS BIGINT) AS n,
            (SELECT COUNT(DISTINCT lang) FROM documents) AS card_a,
            (SELECT COUNT(DISTINCT source) FROM documents) AS card_b,
            CAST(SUM(CAST(
              (nab - na*nb/CAST(n AS DOUBLE)) * (nab - na*nb/CAST(n AS DOUBLE))
                / (na*nb/CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS chi2,
            CAST(SUM(CAST(CASE WHEN rn_a = 1
              THEN (na/CAST(n AS DOUBLE)) * LN(na/CAST(n AS DOUBLE))
              ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS ha,
            CAST(SUM(CAST(
              (nab/CAST(n AS DOUBLE)) * LN(nab/CAST(nb AS DOUBLE))
              AS DECIMAL(28,12))) AS DOUBLE) AS dep
          FROM marg
        )
        SELECT n, card_a, card_b,
          printf('%.4f', CAST(CAST(ROUND(chi2 / n, 4) AS DECIMAL(18,4)) AS DOUBLE)) AS phi2,
          printf('%.4f', CAST(CAST(ROUND(SQRT(chi2 / n / (LEAST(card_a, card_b) - 1)), 4) AS DECIMAL(18,4)) AS DOUBLE)) AS cramers_v,
          printf('%.4f', CAST(CAST(ROUND(SQRT(
            GREATEST(0.0, chi2 / n
              - (card_a-1.0)*(card_b-1.0)/(n-1.0))
            / (LEAST(card_a - (card_a-1.0)*(card_a-1.0)/(n-1.0),
                     card_b - (card_b-1.0)*(card_b-1.0)/(n-1.0)) - 1)),
            4) AS DECIMAL(18,4)) AS DOUBLE)) AS cramers_v_bc,
          printf('%.4f', CAST(CAST(ROUND((dep - ha) / ha, 4) AS DECIMAL(18,4)) AS DOUBLE)) AS theils_u,
          printf('%.4f', CAST(CAST(ROUND(SQRT(chi2 / n / (chi2 / n + n)), 4) AS DECIMAL(18,4)) AS DOUBLE)) AS contingency
        FROM sums""")),

    // categoricalInformationValue: three priority-class indicators
    // against the "order finished" tag (reference
    // AggregateFunctionCategoricalInformationValue.h:147 element
    // formula; N-ary flags + tag signature → one column per flag).
    QueryDef(
      "assoc_categorical_iv",
      (s, dir) =>
        Association.categoricalIV(
          Tables(s, dir, "orders"),
          Seq(
            "urgent" -> col("o_orderpriority").startsWith("1"),
            "high" -> col("o_orderpriority").startsWith("2"),
            "low" -> (col("o_orderpriority").startsWith("4") ||
              col("o_orderpriority").startsWith("5"))),
          col("o_orderstatus") === "F"),
      Some("""
        WITH f AS (
          SELECT
            o_orderpriority LIKE '1%' AS c_urgent,
            o_orderpriority LIKE '2%' AS c_high,
            (o_orderpriority LIKE '4%' OR o_orderpriority LIKE '5%') AS c_low,
            o_orderstatus = 'F' AS tag
          FROM orders
        ),
        s AS (
          SELECT
            SUM(CASE WHEN c_urgent AND NOT tag THEN 1 ELSE 0 END) AS no_urgent,
            SUM(CASE WHEN c_urgent AND tag THEN 1 ELSE 0 END) AS yes_urgent,
            SUM(CASE WHEN c_high AND NOT tag THEN 1 ELSE 0 END) AS no_high,
            SUM(CASE WHEN c_high AND tag THEN 1 ELSE 0 END) AS yes_high,
            SUM(CASE WHEN c_low AND NOT tag THEN 1 ELSE 0 END) AS no_low,
            SUM(CASE WHEN c_low AND tag THEN 1 ELSE 0 END) AS yes_low,
            SUM(CASE WHEN NOT tag THEN 1 ELSE 0 END) AS sum_no,
            SUM(CASE WHEN tag THEN 1 ELSE 0 END) AS sum_yes
          FROM f
        )
        SELECT
          ROUND((no_urgent/CAST(sum_no AS DOUBLE) - yes_urgent/CAST(sum_yes AS DOUBLE))
            * (LN(no_urgent/CAST(sum_no AS DOUBLE)) - LN(yes_urgent/CAST(sum_yes AS DOUBLE))), 6) AS iv_urgent,
          ROUND((no_high/CAST(sum_no AS DOUBLE) - yes_high/CAST(sum_yes AS DOUBLE))
            * (LN(no_high/CAST(sum_no AS DOUBLE)) - LN(yes_high/CAST(sum_yes AS DOUBLE))), 6) AS iv_high,
          ROUND((no_low/CAST(sum_no AS DOUBLE) - yes_low/CAST(sum_yes AS DOUBLE))
            * (LN(no_low/CAST(sum_no AS DOUBLE)) - LN(yes_low/CAST(sum_yes AS DOUBLE))), 6) AS iv_low
        FROM s""")),

    // groupConcat (default "," separator), singleValueOrNull and the
    // -SimpleState spellings. groupConcat is arrival-order-dependent in
    // the reference, so the query sorts the elements post-hoc to make the
    // check deterministic under Spark's partition-order collect.
    QueryDef(
      "agg_misc_nation",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_regionkey,
            array_join(array_sort(split(groupConcat(n_name), ',')), ',') AS names,
            singleValueOrNull(n_regionkey * 10) AS only_val,
            singleValueOrNull(n_nationkey) AS only_nation,
            sumSimpleState(n_nationkey) AS ss,
            minSimpleState(n_nationkey) AS mn,
            maxSimpleState(n_nationkey) AS mx
          FROM nation
          GROUP BY n_regionkey
          ORDER BY n_regionkey""")
      },
      Some("""
        SELECT n_regionkey,
          string_agg(n_name, ',' ORDER BY n_name) AS names,
          CASE WHEN COUNT(DISTINCT n_regionkey * 10) = 1
               THEN MIN(n_regionkey * 10) END AS only_val,
          CASE WHEN COUNT(DISTINCT n_nationkey) = 1
               THEN MIN(n_nationkey) END AS only_nation,
          CAST(SUM(n_nationkey) AS BIGINT) AS ss,
          MIN(n_nationkey) AS mn,
          MAX(n_nationkey) AS mx
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey""")),

    // avgWeighted, sumCount, exponentialMovingAverage over the events
    // stream. EMA feeds hours-since-dataset-origin (not raw epoch
    // seconds) so 2^(t/h) stays inside double range — see the alias
    // scaladoc for the closed-form derivation.
    QueryDef(
      "agg_weighted_ema",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            ROUND(avg_w_raw, 6) AS avg_w,
            ROUND(sc.sum, 4) AS val_sum,
            sc.count AS val_cnt,
            ROUND(ema_raw, 6) AS ema24
          FROM (
            SELECT event_type,
              avgWeighted(value, user_id % 5 + 1) AS avg_w_raw,
              sumCount(value) AS sc,
              exponentialMovingAverage(24.0, value,
                (unix_timestamp(ts) - 1704067200) / 3600.0) AS ema_raw
            FROM events GROUP BY event_type)
          ORDER BY event_type""")
      },
      Some("""
        SELECT event_type,
          ROUND(SUM(value * (user_id % 5 + 1)) / SUM(CAST(user_id % 5 + 1 AS DOUBLE)), 6) AS avg_w,
          ROUND(SUM(value), 4) AS val_sum,
          COUNT(value) AS val_cnt,
          ROUND(SUM(value * POW(2, (FLOOR(EPOCH(ts)) - 1704067200) / 3600.0 / 24.0))
            / SUM(POW(2, (FLOOR(EPOCH(ts)) - 1704067200) / 3600.0 / 24.0)), 6) AS ema24
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // Scalar long-tail spellings: arithmetic/bit, trim/pad, date-part and
    // add/subtract-unit families, all through the dialect registry (full
    // codegen — no UDFs).
    QueryDef(
      "scalar_longtail",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_nationkey AS k,
            intDiv(n_nationkey, 4) AS idiv,
            moduloOrZero(n_nationkey, 7) AS modz,
            bitShiftLeft(1, modulo(n_nationkey, 8)) AS shl,
            bitTest(n_nationkey, 2) AS btest,
            leftPad(n_name, 20, '.') AS padded,
            trimBoth(concatWithSeparator('', '  ', n_name, ' ')) AS trimmed,
            toQuarter(addDays(DATE '2024-01-01', n_nationkey * 11)) AS q,
            toDayOfYear(addDays(DATE '2024-01-01', n_nationkey * 11)) AS doy,
            toLastDayOfMonth(addDays(DATE '2024-01-01', n_nationkey * 11)) AS lday,
            addMonths(addDays(DATE '2024-01-01', n_nationkey * 11), 3) AS addm,
            addHours(TIMESTAMP '2024-01-01 00:00:00', n_nationkey) AS addh,
            subtractMinutes(TIMESTAMP '2024-01-01 00:00:00', multiply(n_nationkey, 5)) AS subm,
            isFinite(divide(1, n_nationkey)) AS fin,
            ifNotFinite(divide(1, n_nationkey), -1.0) AS finval
          FROM nation
          ORDER BY k""")
      },
      Some("""
        SELECT n_nationkey AS k,
          n_nationkey // 4 AS idiv,
          CASE WHEN n_nationkey % 7 = 0 THEN 0 ELSE n_nationkey % 7 END AS modz,
          (1::BIGINT << (n_nationkey % 8)) AS shl,
          ((n_nationkey >> 2) & 1) AS btest,
          lpad(n_name, 20, '.') AS padded,
          trim('  ' || n_name || ' ') AS trimmed,
          quarter(DATE '2024-01-01' + to_days(n_nationkey * 11)) AS q,
          dayofyear(DATE '2024-01-01' + to_days(n_nationkey * 11)) AS doy,
          last_day(DATE '2024-01-01' + to_days(n_nationkey * 11)) AS lday,
          CAST((DATE '2024-01-01' + to_days(n_nationkey * 11)) + INTERVAL 3 MONTH AS DATE) AS addm,
          TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (n_nationkey) HOUR AS addh,
          TIMESTAMP '2024-01-01 00:00:00' - INTERVAL (n_nationkey * 5) MINUTE AS subm,
          (n_nationkey <> 0) AS fin,
          CASE WHEN n_nationkey = 0 THEN -1.0 ELSE 1.0 / n_nationkey END AS finval
        FROM nation
        ORDER BY k""")),

    // deltaSumTimestamp: the aggregate form (collect (t,v), sort at
    // finish) — unlike the window-based delta_sum query this survives
    // arbitrary shuffle merge order, which is the whole point of the
    // reference's timestamp-carrying variant.
    QueryDef(
      "delta_sum_timestamp",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        ev.groupBy((col("user_id") % 16).as("g"))
          .agg(TimeOrderedAggregates.deltaSumTimestamp(
            Tables.tsUs(col("ts")), col("value")).as("delta_sum"))
          .orderBy(col("g"))
      },
      Some("""
        WITH d AS (
          SELECT user_id % 16 AS g,
            value - LAG(value) OVER (
              PARTITION BY user_id % 16 ORDER BY epoch_us(ts), value) AS d
          FROM events
        )
        SELECT g,
          CAST(SUM(CAST(CASE WHEN d > 0 THEN d ELSE 0.0 END
            AS DECIMAL(18,6))) AS DOUBLE) AS delta_sum
        FROM d GROUP BY g ORDER BY g""")),

    // xirr: 20 synthetic portfolios from the orders table — early orders
    // are investments (negative flows), later ones returns. No ANSI-SQL
    // oracle exists for Newton-iterated IRR → rows-only in the driver
    // gate; AggregatorsSpec holds the golden-value and NPV(root)≈0 gates.
    QueryDef(
      "xirr_portfolio",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val flow = when(col("o_orderdate") < lit("1998-01-01").cast("date"),
          -col("o_totalprice")).otherwise(col("o_totalprice") * 1.8)
        o.groupBy((col("o_custkey") % 20).as("g"))
          .agg(TimeOrderedAggregates.xirr(
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long"),
            flow).as("irr"))
          .select(col("g"), round(col("irr"), 6).as("irr"))
          .orderBy(col("g"))
      },
      // GOLDEN VECTOR oracle (no portable SQL counterpart exists):
      // literal VALUES cross-validated by GoldenVectorProvenanceSpec:
      // an independent BISECTION solver on the same NPV definition,
      // over independently-derived flows from the same parquet, lands
      // on every pinned value — certifying the roots, not the Newton
      // solver that produced them. sf0.01 ONLY.
      Some("""
        SELECT CAST(g AS BIGINT) AS g, CAST(irr AS DOUBLE) AS irr FROM (VALUES
          (0, 0.250823),
          (1, 0.323274),
          (2, 0.327054),
          (3, 0.284605),
          (4, 0.352191),
          (5, 0.280757),
          (6, 0.230807),
          (7, 0.262445),
          (8, 0.278199),
          (9, 0.256992),
          (10, 0.27799),
          (11, 0.272957),
          (12, 0.273732),
          (13, 0.286647),
          (14, 0.217468),
          (15, 0.230602),
          (16, 0.253004),
          (17, 0.233998),
          (18, 0.342444),
          (19, 0.251773)) AS t(g, irr) ORDER BY 1""")),

    // finderFunnelByTimes: repeat-conversion funnel runs per day slot
    // (reference AggregateFunctionFinderFunnelByTimes.h — greedy
    // forward scan, counts every run, not just the deepest level). No
    // SQL oracle exists for the greedy consume-and-restart semantics →
    // golden-vector pinned; hand-traced reference cases gate the algorithm in
    // AggregatorsSpec.
    QueryDef(
      "funnel_by_times",
      (s, dir) => {
        import graft.aggregates.FinderFunnelByTimesAgg.finderFunnelByTimes
        val dayUs = 86400L * 1000000
        val startUs = 1704067200L * 1000000 // 2024-01-01 UTC
        val f = finderFunnelByTimes(startUs, dayUs, 30, 12L * 3600 * 1000000, 3) _
        val e = Tables(s, dir, "events")
          .withColumn("step",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3).otherwise(0))
          .filter(col("step") > 0)
        e.groupBy(col("user_id"))
          .agg(f(Tables.tsUs(col("ts")), col("step")).as("counts"))
          .select(posexplode(col("counts")).as(Seq("idx", "runs")))
          .groupBy(col("idx")).agg(sum(col("runs")).as("runs"))
          .select(((col("idx") / 3).cast("int") - 1).as("slot"),
            (col("idx") % 3 + 1).cast("int").as("level"),
            col("runs"))
          .filter(col("runs") > 0)
          .orderBy(col("slot"), col("level"))
      },
      // GOLDEN VECTOR oracle: deterministic function of the events table
      // (no seed, greedy consume-and-restart semantics with no SQL
      // counterpart); the algorithm itself is gated by hand-traced
      // reference cases in AggregatorsSpec. Pin freezes the sf0.01
      // integration output. sf0.01 ONLY.
      Some("""
        SELECT CAST(slot AS INTEGER) AS slot, CAST(level AS INTEGER) AS level,
          CAST(runs AS BIGINT) AS runs FROM (VALUES
          (-1,1,2017), (-1,2,366), (-1,3,37), (0,1,68), (0,2,14), (0,3,2),
          (1,1,68), (1,2,13), (1,3,2), (2,1,63), (2,2,13), (2,3,3),
          (3,1,60), (3,2,11), (3,3,1), (4,1,64), (4,2,13), (4,3,2),
          (5,1,74), (5,2,18), (5,3,2), (6,1,63), (6,2,8), (7,1,63),
          (7,2,10), (8,1,55), (8,2,9), (9,1,81), (9,2,12), (10,1,67),
          (10,2,13), (10,3,2), (11,1,73), (11,2,12), (11,3,1), (12,1,71),
          (12,2,10), (12,3,2), (13,1,83), (13,2,14), (13,3,2), (14,1,66),
          (14,2,14), (15,1,55), (15,2,12), (16,1,64), (16,2,11), (17,1,79),
          (17,2,15), (17,3,2), (18,1,55), (18,2,10), (18,3,2), (19,1,77),
          (19,2,11), (19,3,1), (20,1,73), (20,2,12), (20,3,2), (21,1,68),
          (21,2,14), (21,3,2), (22,1,62), (22,2,10), (22,3,1), (23,1,62),
          (23,2,16), (23,3,1), (24,1,71), (24,2,8), (25,1,69), (25,2,14),
          (25,3,3), (26,1,66), (26,2,14), (27,1,70), (27,2,14), (27,3,2),
          (28,1,59), (28,2,11), (28,3,1), (29,1,68), (29,2,10), (29,3,1)) AS t(slot, level, runs) ORDER BY 1, 2""")),

    // meanZTest with known population variances (statistic only, like
    // the repo's t-tests).
    QueryDef(
      "stat_mean_ztest",
      (s, dir) =>
        StatTests.meanZTest(
          Tables(s, dir, "events").filter(col("event_type").isin("click", "purchase")),
          col("value"), col("event_type") === "click", 900.0, 870.0),
      Some("""
        WITH e AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS v,
                     event_type = 'click' AS a
                   FROM events WHERE event_type IN ('click', 'purchase')),
        m0 AS (SELECT
            CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
            CAST(SUM(CAST(CASE WHEN a THEN v ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS sx_a,
            CAST(SUM(CAST(CASE WHEN a THEN 0 ELSE v END AS DECIMAL(18,6))) AS DOUBLE) AS sx_b
          FROM e)
        SELECT n_a, n_b,
          ROUND((sx_a / n_a - sx_b / n_b) / SQRT(900.0 / n_a + 870.0 / n_b), 6) AS z
        FROM m0""")),

    // ndcg (reference AggregateFunctionNdcg.h:100): entries grouped by
    // rank_id; DCG pairs pred-descending relevance with the i-th
    // SMALLEST rank as discount position, IDCG pairs each relevance with
    // its own rank; result is the mean of dcg/idcg over rank_ids. The
    // position alignment is two row_number windows joined on position —
    // no per-group collect.
    QueryDef(
      "ndcg_ranking",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("event_type").as("grp"),
            (col("user_id") % 3).as("rank_id"),
            (col("event_id") % 10).as("rank"),
            col("value").as("pred"),
            (col("event_id") % 4).as("label"))
        val rel = (pow(lit(2.0), col("label") + 1) - 1).cast("double")
        val byPred = Window.partitionBy(col("grp"), col("rank_id"))
          .orderBy(col("pred").desc, col("rank"), col("label"))
        val byRank = Window.partitionBy(col("grp"), col("rank_id"))
          .orderBy(col("rank"), col("pred"), col("label"))
        val predSide = e.select(col("grp"), col("rank_id"),
          rel.as("rel"), col("rank"),
          row_number().over(byPred).as("pos"))
        val rankSide = e.select(col("grp"), col("rank_id"), col("rank"),
          row_number().over(byRank).as("pos"))
        import graft.Num._
        val joined = predSide.alias("p")
          .join(rankSide.alias("r"), Seq("grp", "rank_id", "pos"))
          .groupBy(col("grp"), col("rank_id"))
          .agg(
            dsum6(col("p.rel") / log2(col("p.rank") + 2)).as("idcg"),
            dsum6(col("p.rel") / log2(col("r.rank") + 2)).as("dcg"))
        joined.groupBy(col("grp"))
          .agg(graft.Num.dq6(davg6(col("dcg") / col("idcg"))).as("ndcg"))
          .orderBy(col("grp"))
      },
      Some("""
        WITH e AS (
          SELECT event_type AS grp, user_id % 3 AS rank_id,
            event_id % 10 AS rank, value AS pred,
            CAST((1::BIGINT << (event_id % 4 + 1)) - 1 AS DOUBLE) AS rel
          FROM events
        ),
        p AS (SELECT grp, rank_id, rel, rank,
                ROW_NUMBER() OVER (PARTITION BY grp, rank_id
                  ORDER BY pred DESC, rank, rel) AS pos
              FROM e),
        r AS (SELECT grp, rank_id, rank,
                ROW_NUMBER() OVER (PARTITION BY grp, rank_id
                  ORDER BY rank, pred, rel) AS pos
              FROM e),
        g AS (SELECT p.grp, p.rank_id,
                CAST(SUM(CAST(p.rel / LOG2(p.rank + 2) AS DECIMAL(18,6))) AS DOUBLE) AS idcg,
                CAST(SUM(CAST(p.rel / LOG2(r.rank + 2) AS DECIMAL(18,6))) AS DOUBLE) AS dcg
              FROM p JOIN r USING (grp, rank_id, pos)
              GROUP BY p.grp, p.rank_id)
        SELECT grp,
          CAST(CAST(ROUND(CAST(SUM(CAST(dcg / idcg AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS ndcg
        FROM g GROUP BY grp ORDER BY grp""")),

    // groupArrayInsertAt (reference AggregateFunctionGroupArrayInsertAt.h):
    // value placed at its position index, absent positions take the
    // default. The reference leaves same-position collisions unspecified;
    // this pins them to MIN for determinism. Output posexploded so the
    // gate hash-checks every element.
    QueryDef(
      "group_array_insert_at",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val slots = e.groupBy(col("event_type").as("grp"),
            (col("user_id") % 8).as("pos"))
          .agg(min(col("user_id")).as("v"))
        val arrs = slots.groupBy(col("grp"))
          .agg(map_from_entries(collect_list(struct(col("pos"), col("v")))).as("m"))
          .select(col("grp"),
            transform(sequence(lit(0), lit(9)),
              i => coalesce(element_at(col("m"), i.cast("long")), lit(-1L))).as("arr"))
        arrs.select(col("grp"), posexplode(col("arr")).as(Seq("pos", "v")))
          .orderBy(col("grp"), col("pos"))
      },
      Some("""
        WITH slots AS (
          SELECT event_type AS grp, user_id % 8 AS pos, MIN(user_id) AS v
          FROM events GROUP BY 1, 2
        ),
        grid AS (
          SELECT g.grp, s.pos
          FROM (SELECT DISTINCT grp FROM slots) g
          CROSS JOIN (SELECT UNNEST(generate_series(0, 9)) AS pos) s
        )
        SELECT grid.grp, CAST(grid.pos AS INT) AS pos,
          COALESCE(slots.v, -1) AS v
        FROM grid LEFT JOIN slots ON grid.grp = slots.grp AND grid.pos = slots.pos
        ORDER BY grid.grp, grid.pos""")),

    // sparkbar over the events stream: 12 buckets spanning hours 0-23,
    // heights from per-hour value sums (two points per bucket exercises
    // the reference's mean-of-points path).
    QueryDef(
      "sparkbar_hourly",
      (s, dir) =>
        Sparkbar.render(Tables(s, dir, "events"),
            col("event_type"), hour(col("ts")), col("value"),
            width = 12, fromX = 0L, toX = 23L)
          .withColumnRenamed("k", "event_type")
          .orderBy(col("event_type")),
      Some("""
        WITH pts AS (
          SELECT event_type AS k, hour(ts) AS x,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ysum
          FROM events WHERE hour(ts) BETWEEN 0 AND 23
          GROUP BY 1, 2
        ),
        bk AS (
          SELECT k, LEAST(CAST(FLOOR(12.0 / 24.0 * x) AS INT), 11) AS b,
            ROUND(CAST(SUM(CAST(ysum AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS h
          FROM pts GROUP BY 1, 2
        ),
        lv AS (
          SELECT k, b,
            CASE WHEN h <= 0 OR MAX(CASE WHEN h > 0 THEN h END) OVER (PARTITION BY k) IS NULL
                 THEN 0
                 ELSE CAST(FLOOR(h * 7 / MAX(CASE WHEN h > 0 THEN h END) OVER (PARTITION BY k) + 1) AS INT)
            END AS lvl
          FROM bk
        )
        SELECT k AS event_type,
          string_agg(substr(' ▁▂▃▄▅▆▇█', lvl + 1, 1), '' ORDER BY b) AS bar
        FROM lv GROUP BY k ORDER BY event_type""")),

    // userDistribution (reference AggregateFunctionUserDistribution.h:47
    // + ...Common.h:27): per user × time-slot a state byte — ARRIVE(1)
    // when the user had an event in the slot, NEWONE(2) when the user's
    // registration (first-seen) falls in the same slot. Consumed here as
    // the per-slot DAU / new-user distribution. Registration is derived
    // as min(ts) per user; slots are days of Jan 2024 (granularity 1d,
    // 30 slots), matching the (start_time, granularity, num_slots)
    // parameterization.
    QueryDef(
      "user_distribution_daily",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val reg = e.groupBy("user_id").agg(min(col("d")).as("regd"))
        val slots = e.distinct()
          .join(reg, "user_id")
          .withColumn("slot", datediff(col("d"), lit("2024-01-01").cast("date")))
          .filter(col("slot") >= 0 && col("slot") < 30)
          .withColumn("state",
            lit(1) + when(col("d") === col("regd"), 2).otherwise(0))
        slots.groupBy(col("slot"))
          .agg(count(lit(1)).as("arrive_users"),
            sum(when(col("state") === 3, 1L).otherwise(0L)).as("new_users"))
          .orderBy(col("slot"))
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        reg AS (SELECT user_id, MIN(d) AS regd FROM e GROUP BY user_id),
        slots AS (
          SELECT e.user_id, datediff('day', DATE '2024-01-01', e.d) AS slot,
            CASE WHEN e.d = reg.regd THEN 3 ELSE 1 END AS state
          FROM e JOIN reg ON e.user_id = reg.user_id
          WHERE datediff('day', DATE '2024-01-01', e.d) BETWEEN 0 AND 29
        )
        SELECT CAST(slot AS INT) AS slot,
          COUNT(*) AS arrive_users,
          CAST(SUM(CASE WHEN state = 3 THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        FROM slots GROUP BY slot ORDER BY slot""")),

    // slideMatchCount over the userDistribution states (reference
    // AggregateFunctionSlideMatchCount.h:72 — slide a state pattern over
    // each user's slot array and count matching offsets). Pattern here is
    // [NEWONE+ARRIVE, ARRIVE]: registration day immediately followed by
    // an active day — the day-1 activation metric. The slide is the
    // slot+1 self-join; no per-user array materialization.
    QueryDef(
      "slide_match_activation",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val reg = e.groupBy("user_id").agg(min(col("d")).as("regd"))
        val slots = e.join(reg, "user_id")
          .withColumn("slot", datediff(col("d"), lit("2024-01-01").cast("date")))
          .filter(col("slot") >= 0 && col("slot") < 30)
          .withColumn("state",
            lit(1) + when(col("d") === col("regd"), 2).otherwise(0))
        val s1 = slots.filter(col("state") === 3)
          .select(col("user_id"), col("slot"))
        val s2 = slots.select(col("user_id").as("u2"), col("slot").as("slot2"))
        s1.join(s2, s1("user_id") === s2("u2") && (s1("slot") + 1) === s2("slot2"))
          .agg(count(lit(1)).as("match_count"),
            countDistinct(col("user_id")).as("users_matched"))
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        reg AS (SELECT user_id, MIN(d) AS regd FROM e GROUP BY user_id),
        slots AS (
          SELECT e.user_id, datediff('day', DATE '2024-01-01', e.d) AS slot,
            CASE WHEN e.d = reg.regd THEN 3 ELSE 1 END AS state
          FROM e JOIN reg ON e.user_id = reg.user_id
          WHERE datediff('day', DATE '2024-01-01', e.d) BETWEEN 0 AND 29
        )
        SELECT COUNT(*) AS match_count,
          COUNT(DISTINCT s1.user_id) AS users_matched
        FROM slots s1 JOIN slots s2
          ON s1.user_id = s2.user_id AND s1.slot + 1 = s2.slot
        WHERE s1.state = 3""")),

    // lastRangeCount (reference AggregateFunctionLastRangeCount.h:93):
    // for each output slot, count users with ANY arrival in the
    // `duration` slots ending there — the rolling weekly-active-users
    // curve over the userDistribution day grid. The slide is an explode
    // of each (user, day) into the ≤duration slots it feeds (bounded
    // fan-out, no join — a range join against the slot grid would plan
    // a nested loop).
    QueryDef(
      "last_range_count_wau",
      (s, dir) => {
        val days = Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("d"))
          .filter(col("d").between(0, 29))
          .distinct()
        days
          .select(col("user_id"),
            explode(sequence(greatest(col("d"), lit(6)),
              least(col("d") + 6, lit(29)))).as("slot"))
          .groupBy(col("slot").cast("int").as("slot"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy(col("slot"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id,
            DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
          FROM events
          WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-30'),
        grid AS (SELECT UNNEST(generate_series(6, 29)) AS slot)
        SELECT CAST(grid.slot AS INT) AS slot,
          COUNT(DISTINCT days.user_id) AS active_users
        FROM grid JOIN days ON days.d BETWEEN grid.slot - 6 AND grid.slot
        GROUP BY grid.slot ORDER BY slot""")),

    // Standalone Spearman rank correlation (reference upstream
    // AggregateFunctionRankCorrelation.h — average ranks for ties, then
    // Pearson on the ranks). Mid-ranks come from the distinct-value
    // histogram joined back (the StatTests.rankSums shape) — no per-row
    // global sort survives into the aggregate.
    QueryDef(
      "stat_rank_correlation",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("value").as("va"), (col("event_id") % 100).cast("double").as("vb"))
        def midRanks(df: org.apache.spark.sql.DataFrame, c: String, out: String) = {
          val cnt = df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
          val wCum = Window.orderBy(col(c)).rowsBetween(Window.unboundedPreceding, -1)
          cnt.withColumn("__before", coalesce(sum(col("__c")).over(wCum), lit(0L)))
            .select(col(c), (col("__before") + (col("__c") + 1) / 2.0).as(out))
        }
        val ra = midRanks(e, "va", "ra")
        val rb = midRanks(e, "vb", "rb")
        e.join(ra, "va").join(rb, "vb")
          .agg(round(corr(col("ra"), col("rb")), 6).cast(graft.Num.D6).as("rho"))
      },
      Some("""
        WITH e AS (SELECT value AS va, CAST(event_id % 100 AS DOUBLE) AS vb FROM events),
        ra AS (
          SELECT va, SUM(c) OVER (ORDER BY va ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b, c
          FROM (SELECT va, COUNT(*) AS c FROM e GROUP BY va)
        ),
        rb AS (
          SELECT vb, SUM(c) OVER (ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b, c
          FROM (SELECT vb, COUNT(*) AS c FROM e GROUP BY vb)
        )
        SELECT CAST(ROUND(CORR(COALESCE(ra.b, 0) + (ra.c + 1) / 2.0,
                          COALESCE(rb.b, 0) + (rb.c + 1) / 2.0), 6) AS DECIMAL(18,6)) AS rho
        FROM e JOIN ra USING (va) JOIN rb USING (vb)""")),

    // Vector distance spellings over the embeddings table (dialect
    // surface of the ANN stack): 25 probe/candidate pairs via an
    // equi-key join, distances in double on both engines (the oracle
    // casts the float32 lists up before list_inner_product /
    // list_distance so both sides do the same double math).
    QueryDef(
      "vector_distance_pairs",
      (s, dir) => {
        Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
        s.sql("""
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ROUND(dotProduct(a.embedding, b.embedding), 6) AS dot,
            ROUND(L2Distance(a.embedding, b.embedding), 6) AS l2,
            ROUND(cosineDistance(a.embedding, b.embedding), 6) AS cos_d
          FROM (SELECT * FROM embeddings WHERE vec_id < 5) a
          JOIN (SELECT * FROM embeddings WHERE vec_id >= 5 AND vec_id < 30) b
            ON b.vec_id % 5 = a.vec_id
          ORDER BY id_a, id_b""")
      },
      Some("""
        WITH d AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id < 30)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ROUND(list_inner_product(a.e, b.e), 6) AS dot,
          ROUND(list_distance(a.e, b.e), 6) AS l2,
          ROUND(1.0 - list_cosine_similarity(a.e, b.e), 6) AS cos_d
        FROM (SELECT * FROM d WHERE vec_id < 5) a
        JOIN (SELECT * FROM d WHERE vec_id >= 5) b ON b.vec_id % 5 = a.vec_id
        ORDER BY id_a, id_b""")),

    // frequency: the reference's fixed 10-bucket value histogram,
    // projected to scalar columns for the gate (buckets 1..5 exact,
    // 6-10 / 11-20 / 21-50 / 51-100 / >100 ranges).
    QueryDef(
      "agg_frequency_buckets",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag,
            f[0] AS f1, f[1] AS f2, f[2] AS f3, f[3] AS f4, f[4] AS f5,
            f[5] AS f6_10, f[6] AS f11_20, f[7] AS f21_50,
            f[8] AS f51_100, f[9] AS f_over100
          FROM (SELECT l_returnflag, frequency(CAST(l_quantity AS BIGINT)) AS f
                FROM lineitem GROUP BY l_returnflag)
          ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN q = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(SUM(CASE WHEN q = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          CAST(SUM(CASE WHEN q = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
          CAST(SUM(CASE WHEN q = 4 THEN 1 ELSE 0 END) AS BIGINT) AS f4,
          CAST(SUM(CASE WHEN q = 5 THEN 1 ELSE 0 END) AS BIGINT) AS f5,
          CAST(SUM(CASE WHEN q BETWEEN 6 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS f6_10,
          CAST(SUM(CASE WHEN q BETWEEN 11 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS f11_20,
          CAST(SUM(CASE WHEN q BETWEEN 21 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS f21_50,
          CAST(SUM(CASE WHEN q > 50 AND q <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS f51_100,
          CAST(SUM(CASE WHEN q > 100 THEN 1 ELSE 0 END) AS BIGINT) AS f_over100
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // genArrayMonth (reference AggregateFunctionGenArrayMonth.h:42 —
    // genArray with month-granularity slots via toRelativeMonthNum):
    // per-customer order-activity masks over the first 60 months from
    // 1995-01, one BIGINT per flavor.
    QueryDef(
      "gen_array_month",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_custkey"),
            ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
              .as("m"),
            col("o_orderpriority"))
          .filter(col("m").between(0, 59))
          .groupBy(col("o_custkey"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), m))").as("active_mask"),
            expr("bit_or(CASE WHEN o_orderpriority LIKE '1%' " +
              "THEN shiftleft(CAST(1 AS BIGINT), m) ELSE CAST(0 AS BIGINT) END)")
              .as("urgent_mask"))
          .orderBy(col("o_custkey"))
      },
      Some("""
        WITH d AS (SELECT o_custkey, o_orderpriority,
            (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1 AS m
          FROM orders)
        SELECT o_custkey,
          BIT_OR(CAST(1 AS BIGINT) << m) AS active_mask,
          BIT_OR(CASE WHEN o_orderpriority LIKE '1%' THEN CAST(1 AS BIGINT) << m
                      ELSE CAST(0 AS BIGINT) END) AS urgent_mask
        FROM d WHERE m BETWEEN 0 AND 59
        GROUP BY o_custkey ORDER BY o_custkey""")),

    // covarSampMatrix / corrMatrix (reference
    // AggregateFunctionVarianceMatrix.h:64): all pairwise statistics of
    // N columns in ONE aggregate pass — the N(N+1)/2 upper triangle as
    // fixed-width scalar columns (no N×N array output to trip the gate).
    QueryDef(
      "stat_covar_matrix",
      (s, dir) => {
        // Price in thousands: keeps every matrix entry ≤ ~1e2 so the
        // ROUND(4) cushion dwarfs co-moment merge-order noise.
        val li = Tables(s, dir, "lineitem").select(
          col("l_quantity").as("q"), (col("l_extendedprice") / 1000).as("p"),
          col("l_discount").as("d"), col("l_tax").as("t"))
        val cols = Seq("q", "p", "d", "t")
        // + 0.0 normalizes IEEE −0.0 before the decimal round-trip; the
        // quantize-through-decimal-back-to-double makes the driver hash
        // ulp-proof while keeping a hash-stable DOUBLE output column
        // (raw DECIMAL outputs hash-fail — see graft.Num.dq).
        val covs = for {
          i <- cols.indices; j <- 0 to i
        } yield graft.Num.dq(covar_samp(col(cols(i)), col(cols(j))) + lit(0.0), 4)
          .as(s"cov_${cols(i)}${cols(j)}")
        val corrs = for {
          i <- cols.indices; j <- 0 until i
        } yield graft.Num.dq6(corr(col(cols(i)), col(cols(j))) + lit(0.0))
          .as(s"corr_${cols(i)}${cols(j)}")
        li.agg((covs ++ corrs).head, (covs ++ corrs).tail: _*)
      },
      Some("""
        SELECT
          CAST(CAST(ROUND(COVAR_SAMP(l_quantity, l_quantity), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_qq,
          CAST(CAST(ROUND(COVAR_SAMP(l_extendedprice/1000.0, l_quantity), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_pq,
          CAST(CAST(ROUND(COVAR_SAMP(l_extendedprice/1000.0, l_extendedprice/1000.0), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_pp,
          CAST(CAST(ROUND(COVAR_SAMP(l_discount, l_quantity), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_dq,
          CAST(CAST(ROUND(COVAR_SAMP(l_discount, l_extendedprice/1000.0), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_dp,
          CAST(CAST(ROUND(COVAR_SAMP(l_discount, l_discount), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_dd,
          CAST(CAST(ROUND(COVAR_SAMP(l_tax, l_quantity), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_tq,
          CAST(CAST(ROUND(COVAR_SAMP(l_tax, l_extendedprice/1000.0), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_tp,
          CAST(CAST(ROUND(COVAR_SAMP(l_tax, l_discount), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_td,
          CAST(CAST(ROUND(COVAR_SAMP(l_tax, l_tax), 4) + 0.0 AS DECIMAL(18,4)) AS DOUBLE) AS cov_tt,
          CAST(CAST(ROUND(CORR(l_extendedprice/1000.0, l_quantity), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_pq,
          CAST(CAST(ROUND(CORR(l_discount, l_quantity), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_dq,
          CAST(CAST(ROUND(CORR(l_discount, l_extendedprice/1000.0), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_dp,
          CAST(CAST(ROUND(CORR(l_tax, l_quantity), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_tq,
          CAST(CAST(ROUND(CORR(l_tax, l_extendedprice/1000.0), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_tp,
          CAST(CAST(ROUND(CORR(l_tax, l_discount), 6) + 0.0 AS DECIMAL(18,6)) AS DOUBLE) AS corr_td
        FROM lineitem"""))
  )
}
