package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Association
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
          SELECT MAX(n) AS n,
            (SELECT COUNT(DISTINCT lang) FROM documents) AS card_a,
            (SELECT COUNT(DISTINCT source) FROM documents) AS card_b,
            CAST(SUM(CAST(
              (nab - na*nb/CAST(n AS DOUBLE)) * (nab - na*nb/CAST(n AS DOUBLE))
                / (na*nb/CAST(n AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
            CAST(SUM(CAST(CASE WHEN rn_a = 1
              THEN (na/CAST(n AS DOUBLE)) * LN(na/CAST(n AS DOUBLE))
              ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS ha,
            CAST(SUM(CAST(
              (nab/CAST(n AS DOUBLE)) * LN(nab/CAST(nb AS DOUBLE))
              AS DECIMAL(18,6))) AS DOUBLE) AS dep
          FROM marg
        )
        SELECT n, card_a, card_b,
          ROUND(chi2 / n, 6) AS phi2,
          ROUND(SQRT(chi2 / n / (LEAST(card_a, card_b) - 1)), 6) AS cramers_v,
          ROUND(SQRT(
            GREATEST(0.0, chi2 / n
              - (card_a-1.0)*(card_b-1.0)/(n-1.0))
            / (LEAST(card_a - (card_a-1.0)*(card_a-1.0)/(n-1.0),
                     card_b - (card_b-1.0)*(card_b-1.0)/(n-1.0)) - 1)),
            6) AS cramers_v_bc,
          ROUND((dep - ha) / ha, 6) AS theils_u,
          ROUND(SQRT(chi2 / n / (chi2 / n + n)), 6) AS contingency
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
        FROM s"""))
  )
}
