package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions.col

/** The reference's AUC-heuristic aggregate family as gate queries
  * (reference src/AggregateFunctions/AggregateFunctionFastAuc*.cpp,
  * DebiasAuc.cpp, EcpmAuc.cpp, RegAuc.cpp, RegAucV2.cpp) — ML-ranking
  * evaluation over event predictions.
  *
  * Numeric design for ulp-proof oracle parity: preds/labels/weights are
  * integer-derived, so per-bucket tallies and the rank cross-products are
  * exact multiples of 0.5 far below 2^53 — bit-identical in Spark and
  * DuckDB regardless of summation order; only the final division rounds,
  * on identical operands. Results are DECIMAL(18,6)-quantized then cast
  * back to DOUBLE per the gate convention ([[graft.Num.dq]] — raw decimal
  * output columns are not representation-hash-stable across engines).
  *
  * Scale notes: the bucketed aggregates carry a ≤bucket_num sparse map
  * per group (map-side partials tiny, merges order-independent adds);
  * regAuc buffers (pred,label) pairs per group like the reference but
  * evaluates exactly in O(n log n) — per-model evaluation sets, the unit
  * these run over, are small relative to event volume.
  */
object AucFamily {

  val defs: Seq[QueryDef] = Seq(

    // fastAuc2 / fastAuc3 / fastPrevAuc2 (shared bucketed-rank math) +
    // debiasAuc (1/sample_rate weights), 100 buckets over [0,1).
    QueryDef(
      "auc_bucketed_family",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            CAST(fastAuc2(0.01, 0.0, 1.0, (event_id % 997) / 997.0,
              CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END)
              AS DECIMAL(18,6)) AS auc_fast2,
            CAST(fastAuc3(0.01, 0.0, 1.0, (event_id % 997) / 997.0,
              CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END)
              AS DECIMAL(18,6)) AS auc_fast3,
            CAST(fastPrevAuc2(0.01, 0.0, 1.0, (event_id % 997) / 997.0,
              CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END)
              AS DECIMAL(18,6)) AS auc_prev2,
            CAST(debiasAuc(0.01, 0.0, 1.0, (event_id % 997) / 997.0,
              CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END,
              CASE WHEN event_id % 4 = 0 THEN 0.5 ELSE 0.25 END)
              AS DECIMAL(18,6)) AS auc_debias
          FROM events
          GROUP BY event_type
          ORDER BY event_type""")
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 (event_id % 997) / 997.0 AS pred,
                 CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END AS label,
                 CASE WHEN event_id % 4 = 0 THEN 0.5 ELSE 0.25 END AS sr
          FROM events),
        b AS (
          SELECT event_type,
                 least(greatest(CAST(floor(pred / 0.01) AS BIGINT), 0), 99) AS bkt,
                 SUM(CASE WHEN label > 0 THEN 1.0 ELSE 0.0 END) AS pos,
                 SUM(CASE WHEN label > 0 THEN 0.0 ELSE 1.0 END) AS neg,
                 SUM(CASE WHEN label > 0 THEN 1.0 / sr ELSE 0.0 END) AS wpos,
                 SUM(CASE WHEN label > 0 THEN 0.0 ELSE 1.0 / sr END) AS wneg
          FROM t GROUP BY 1, 2),
        o AS (
          SELECT event_type, pos, neg, wpos, wneg,
                 COALESCE(SUM(neg) OVER (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg,
                 COALESCE(SUM(wneg) OVER (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wcumneg
          FROM b)
        SELECT event_type,
          CAST(SUM(pos * (cumneg + neg / 2.0)) / (SUM(pos) * SUM(neg)) AS DECIMAL(18,6)) AS auc_fast2,
          CAST(SUM(pos * (cumneg + neg / 2.0)) / (SUM(pos) * SUM(neg)) AS DECIMAL(18,6)) AS auc_fast3,
          CAST(SUM(pos * (cumneg + neg / 2.0)) / (SUM(pos) * SUM(neg)) AS DECIMAL(18,6)) AS auc_prev2,
          CAST(SUM(wpos * (wcumneg + wneg / 2.0)) / (SUM(wpos) * SUM(wneg)) AS DECIMAL(18,6)) AS auc_debias
        FROM o GROUP BY event_type ORDER BY event_type""")),

    // ecpmAuc: value-weighted ranking concordance over a log10-descending
    // eCPM bucketing (100 buckets over log10 ∈ [-2.5, 2.5)).
    QueryDef(
      "auc_ecpm_ranking",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            CAST(CAST(ecpmAuc(0.01, -2.5, 2.5,
              power(10.0, ((event_id % 1600) / 400.0) - 2.0 + 0.0012345),
              (event_id % 17) + 1.0) AS DECIMAL(18,6)) AS DOUBLE) AS ecpm_auc,
            COUNT(*) AS n
          FROM events
          GROUP BY event_type
          ORDER BY event_type""")
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 power(10.0, ((event_id % 1600) / 400.0) - 2.0 + 0.0012345) AS ecpm,
                 (event_id % 17) + 1.0 AS adv
          FROM events),
        b AS (
          SELECT event_type,
                 least(greatest(CAST(floor((2.5 - log10(ecpm)) / (0.01 * 5.0)) AS BIGINT), 0), 99) AS bkt,
                 SUM(1.0) AS cnt,
                 SUM(adv) AS advsum
          FROM t GROUP BY 1, 2),
        o AS (
          SELECT event_type, cnt, advsum,
                 COALESCE(SUM(advsum) OVER (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumadv_before,
                 SUM(advsum) OVER (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumadv_incl
          FROM b)
        SELECT event_type,
          CAST(CAST(SUM(cnt * cumadv_before + cnt * cumadv_incl)
            / (SUM(cnt) * SUM(advsum) * 2.0) AS DECIMAL(18,6)) AS DOUBLE) AS ecpm_auc,
          CAST(SUM(cnt) AS BIGINT) AS n
        FROM o GROUP BY event_type ORDER BY event_type""")),

    // regAuc flags 1–4 + regAucV2: exact correct-pair fractions per
    // nation over customer (pred = account balance, label = custkey%5).
    // The oracle enumerates unordered pairs directly.
    QueryDef(
      "auc_reg_pairs",
      (s, dir) => {
        Tables(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""
          SELECT c_nationkey AS nk,
            CAST(CAST(regAuc(10000, 1, c_acctbal, CAST(c_custkey % 5 AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS auc_f1,
            CAST(CAST(regAuc(10000, 2, c_acctbal, CAST(c_custkey % 5 AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS auc_f2,
            CAST(CAST(regAuc(10000, 3, c_acctbal, CAST(c_custkey % 5 AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS auc_f3,
            CAST(CAST(regAuc(10000, 4, c_acctbal, CAST(c_custkey % 5 AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS auc_f4,
            CAST(CAST(regAucV2(10000, 1, c_acctbal, CAST(c_custkey % 5 AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS auc_v2
          FROM customer
          GROUP BY c_nationkey
          ORDER BY nk""")
      },
      Some("""
        WITH t AS (
          SELECT c_nationkey AS nk, c_custkey AS id,
                 CAST(c_acctbal AS DOUBLE) AS p,
                 CAST(c_custkey % 5 AS DOUBLE) AS l
          FROM customer),
        pairs AS (
          SELECT a.nk,
                 CASE WHEN (a.p > b.p AND a.l > b.l) OR (a.p < b.p AND a.l < b.l) THEN 1 ELSE 0 END AS conc,
                 CASE WHEN a.p = b.p AND a.l = b.l THEN 1 ELSE 0 END AS tieboth,
                 CASE WHEN a.l = b.l THEN 1 ELSE 0 END AS tielabel
          FROM t a JOIN t b ON a.nk = b.nk AND a.id < b.id),
        agg AS (
          SELECT nk,
                 SUM(conc) AS nc, SUM(tieboth) AS tb, SUM(tielabel) AS tl,
                 COUNT(*) AS tot
          FROM pairs GROUP BY nk)
        SELECT nk,
          CAST(CAST((nc + tb) * 1.0 / tot AS DECIMAL(18,6)) AS DOUBLE) AS auc_f1,
          CAST(CAST((nc + tl) * 1.0 / tot AS DECIMAL(18,6)) AS DOUBLE) AS auc_f2,
          CAST(CAST(nc * 1.0 / tot AS DECIMAL(18,6)) AS DOUBLE) AS auc_f3,
          CAST(CAST(CASE WHEN tot - tl <= 0 THEN -1.0 ELSE nc * 1.0 / (tot - tl) END AS DECIMAL(18,6)) AS DOUBLE) AS auc_f4,
          CAST(CAST((nc + tb) * 1.0 / tot AS DECIMAL(18,6)) AS DOUBLE) AS auc_v2
        FROM agg ORDER BY nk""")),

    // fastAuc: the arrival-order streaming heuristic — value is
    // order-dependent by construction (see FastAucAgg scaladoc), so the
    // stream is PINNED to one deterministic arrival order (a single
    // partition sorted by event_id = the canonical replay); the oracle
    // carries the traced values for that order (sf0.01, like the
    // selection-pinned ANN oracles). Exact single-stream behavior is
    // hand-traced in AucFamilySpec.
    QueryDef(
      "auc_fast_streaming",
      (s, dir) => {
        Tables(s, dir, "events")
          .repartition(1).sortWithinPartitions(col("event_id"))
          .createOrReplaceTempView("events_ordered")
        val out = s.sql("""
          SELECT event_type,
            fastAuc((event_id % 997) / 997.0,
              CASE WHEN (event_id % 997) * 3 + (event_id % 101) * 7 > 1500 THEN 1 ELSE 0 END) AS auc_stream,
            fastAuc(1, (event_id % 997) / 997.0, value) AS auc_regression
          FROM events_ordered
          GROUP BY event_type
          ORDER BY event_type""")
        out.select(col("event_type"),
          graft.Num.dq6(col("auc_stream")).as("auc_stream"),
          graft.Num.dq6(col("auc_regression")).as("auc_regression"))
      },
      // ORDER-PINNED oracle: the canonical replay's traced values
      // (deterministic — verified identical across executor counts);
      // sf0.01 ONLY, like the selection-pinned ANN oracles
      Some("""
        SELECT * FROM (VALUES
          ('click',    CAST(0.926365 AS DOUBLE), CAST(0.485786 AS DOUBLE)),
          ('error',    CAST(0.929995 AS DOUBLE), CAST(0.494287 AS DOUBLE)),
          ('purchase', CAST(0.913766 AS DOUBLE), CAST(0.498990 AS DOUBLE)),
          ('signup',   CAST(0.913951 AS DOUBLE), CAST(0.494544 AS DOUBLE)),
          ('view',     CAST(0.921875 AS DOUBLE), CAST(0.487633 AS DOUBLE)))
          AS t(event_type, auc_stream, auc_regression)
        ORDER BY event_type""")),

    // Streaming bucketed AUC (incremental BucketedRankAucAgg): the
    // histogram state lives in the streaming aggregation state store,
    // the rank-sum fold runs post-drain over cohorts × buckets rows.
    // Oracle recomputes the identical bucketed Mann-Whitney fold in
    // SQL — full hash gate, not rows-only, because every intermediate
    // is an integer-valued double.
    QueryDef(
      "stream_auc_bucketed",
      (s, dir) =>
        graft.streaming.StreamingPipeline
          .bucketedAuc(s, dir, s"stream_auc_${System.nanoTime()}"),
      Some("""
        WITH b AS (
          SELECT CAST(user_id % 4 AS INT) AS cohort,
                 CAST(LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 25.0) AS BIGINT), 0), 19) AS INT) AS bucket,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          FROM events WHERE value IS NOT NULL),
        c AS (
          SELECT cohort, bucket,
                 CAST(SUM(pos) AS DOUBLE) AS pd,
                 CAST(COUNT(*) - SUM(pos) AS DOUBLE) AS nd
          FROM b GROUP BY cohort, bucket),
        w AS (
          SELECT cohort, pd, nd,
                 COALESCE(SUM(nd) OVER (PARTITION BY cohort ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_n
          FROM c)
        SELECT cohort,
               CAST(CAST(ROUND(SUM(pd * (cum_n + nd / 2))
                 / (SUM(pd) * SUM(nd)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS auc
        FROM w
        GROUP BY cohort
        ORDER BY cohort""")))
}
