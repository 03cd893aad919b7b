package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.operators.{LimitBy, StatTests}
import org.apache.spark.sql.functions._

/** Round-3 coverage wave: the set-op matrix's last cell (EXCEPT ALL —
  * reference /root/reference/src/QueryPlan/ExceptStep.h:21, DISTINCT/ALL
  * normalization in src/Optimizer/ImplementSetOperation.cpp), LIMIT n BY
  * as a named surface (src/QueryPlan/LimitByStep.h:23), dictionary-style
  * key lookup (StorageDictionary registration,
  * src/Storages/registerStorages.cpp:121 — a broadcast dim join is the
  * Spark-native dictGet), and the statistical-test aggregate family
  * (src/AggregateFunctions/AggregateFunctionMannWhitney.cpp,
  * AggregateFunctionTTest.h).
  */
object CoverageWave4 {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    // EXCEPT ALL — multiset difference, the DISTINCT twin of
    // setop_intersect_all. Spark's native exceptAll plans a left-anti-ish
    // count-matching shape; we aggregate the survivors per key.
    QueryDef(
      "setop_except_all",
      (s, dir) => {
        val a = Tables(s, dir, "orders").select(col("o_orderstatus").as("st"))
        val b = Tables(s, dir, "orders").filter(col("o_totalprice") > 200000)
          .select(col("o_orderstatus").as("st"))
        a.exceptAll(b).groupBy(col("st")).agg(count(lit(1)).as("n")).orderBy(col("st"))
      },
      Some("""
        SELECT st, COUNT(*) AS n FROM (
          SELECT o_orderstatus AS st FROM orders
          EXCEPT ALL
          SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000) t
        GROUP BY st
        ORDER BY st""")),

    // LIMIT 2 BY o_orderstatus (ClickHouse daily idiom): first 2 orders
    // per status by price. The LimitBy operator's row_number collapses to
    // WindowGroupLimit — per-partition top-n before the exchange.
    QueryDef(
      "limit_by",
      (s, dir) =>
        LimitBy.limitBy(Tables(s, dir, "orders"), 2,
            by = Seq(col("o_orderstatus")),
            order = Seq(col("o_totalprice").desc, col("o_orderkey")))
          .select(col("o_orderstatus").as("st"), col("o_orderkey"),
            col("o_totalprice").cast(D2).cast("double").as("price"))
          .orderBy(col("st"), col("o_orderkey")),
      Some("""
        SELECT o_orderstatus AS st, o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t
        WHERE rn <= 2
        ORDER BY st, o_orderkey""")),

    // Dictionary lookup: nation/region as broadcast dictionaries keyed by
    // their surrogate keys — the dictGet('dict', 'attr', key) analogue.
    // Both dims broadcast (asserted for dims generally in PlanSpec), so
    // the lookup costs zero shuffles on the fact side.
    QueryDef(
      "dict_lookup",
      (s, dir) => {
        val nation = Tables(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val region = Tables(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))
        Tables(s, dir, "customer")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"), dsum2(col("c_acctbal")).as("sum_acctbal"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // quantileExactWeighted: smallest value whose cumulative weight
    // reaches p x total (selection semantics, no interpolation) — weights
    // = quantity, values = price per linestatus.
    QueryDef(
      "agg_quantiles_weighted",
      (s, dir) => {
        import graft.operators.Quantiles
        Quantiles.percentilesExactWeighted(
            Tables(s, dir, "lineitem"), "l_linestatus", "l_extendedprice", "l_quantity",
            Seq(0.5 -> "wq50", 0.9 -> "wq90"))
          .select(col("l_linestatus"),
            col("wq50").cast(D2).cast("double").as("wq50"),
            col("wq90").cast(D2).cast("double").as("wq90"))
          .orderBy(col("l_linestatus"))
      },
      Some("""
        WITH h AS (
          SELECT l_linestatus, l_extendedprice AS v,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2),
        m AS (
          SELECT l_linestatus, v,
            SUM(w) OVER (PARTITION BY l_linestatus ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            SUM(w) OVER (PARTITION BY l_linestatus) AS n
          FROM h)
        SELECT l_linestatus,
          CAST(CAST(MIN(CASE WHEN cum >= 0.5 * n THEN v END) AS DECIMAL(18,2)) AS DOUBLE) AS wq50,
          CAST(CAST(MIN(CASE WHEN cum >= 0.9 * n THEN v END) AS DECIMAL(18,2)) AS DOUBLE) AS wq90
        FROM m
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    // Welch's t-test: click vs purchase event values.
    QueryDef(
      "stat_welch_ttest",
      (s, dir) =>
        StatTests.welchTTest(
          Tables(s, dir, "events").filter(col("event_type").isin("click", "purchase")),
          col("value"), col("event_type") === "click"),
      Some(statOracleMoments +
        """
        SELECT n_a, n_b,
          ROUND((mean_a - mean_b) / SQRT(var_a / n_a + var_b / n_b), 6) AS t,
          ROUND((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
            ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
             (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS df
        FROM m""")),

    // Student's pooled t-test on the same two samples.
    QueryDef(
      "stat_student_ttest",
      (s, dir) =>
        StatTests.studentTTest(
          Tables(s, dir, "events").filter(col("event_type").isin("click", "purchase")),
          col("value"), col("event_type") === "click"),
      Some(statOracleMoments +
        """
        SELECT n_a, n_b,
          ROUND((mean_a - mean_b) / SQRT(
            ((n_a - 1) * var_a + (n_b - 1) * var_b) / (n_a + n_b - 2)
            * (1.0 / n_a + 1.0 / n_b)), 6) AS t
        FROM m""")),

    // Mann–Whitney U via the distributed mid-rank histogram.
    QueryDef(
      "stat_mann_whitney",
      (s, dir) =>
        StatTests.mannWhitneyU(
          Tables(s, dir, "events").filter(col("event_type").isin("click", "purchase")),
          col("value"), col("event_type") === "click"),
      Some("""
        WITH e AS (SELECT CAST(value AS DOUBLE) AS v,
                     event_type = 'click' AS a
                   FROM events WHERE event_type IN ('click', 'purchase')),
        c AS (SELECT v, SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca, COUNT(*) AS c
              FROM e GROUP BY v),
        r AS (SELECT ca, c, COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
              FROM c),
        s AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                     CAST(SUM(c - ca) AS BIGINT) AS n_b,
                     CAST(SUM(ca * (2 * b + c + 1)) AS BIGINT) AS r2_a
              FROM r)
        SELECT n_a, n_b,
          ROUND(CAST(r2_a AS DOUBLE) / 2 - n_a * (n_a + 1) / 2, 6) AS u,
          ROUND((CAST(r2_a AS DOUBLE) / 2 - n_a * (n_a + 1) / 2 - n_a * n_b / 2.0)
            / SQRT(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12.0), 6) AS z
        FROM s""")),

    // ROC AUC: how well `value` ranks purchases above clicks.
    QueryDef(
      "stat_roc_auc",
      (s, dir) =>
        StatTests.rocAuc(
          Tables(s, dir, "events").filter(col("event_type").isin("click", "purchase")),
          col("value"), col("event_type") === "purchase"),
      Some("""
        WITH e AS (SELECT CAST(value AS DOUBLE) AS v,
                     event_type = 'purchase' AS a
                   FROM events WHERE event_type IN ('click', 'purchase')),
        c AS (SELECT v, SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca, COUNT(*) AS c
              FROM e GROUP BY v),
        r AS (SELECT ca, c, COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
              FROM c),
        s AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
                     CAST(SUM(c - ca) AS BIGINT) AS n_neg,
                     CAST(SUM(ca * (2 * b + c + 1)) AS BIGINT) AS r2_pos
              FROM r)
        SELECT n_pos, n_neg,
          ROUND((CAST(r2_pos AS DOUBLE) / 2 - n_pos * (n_pos + 1) / 2)
            / (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
        FROM s"""))
  )

  /** Shared moment-sums CTE for the t-test oracles: the exact decimal
    * quantization sequence must mirror StatTests.moments step for step.
    */
  private def statOracleMoments: String = """
    WITH e AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS v,
                 event_type = 'click' AS a
               FROM events WHERE event_type IN ('click', 'purchase')),
    m0 AS (SELECT
        CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        CAST(SUM(CAST(CASE WHEN a THEN v ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS sx_a,
        CAST(SUM(CAST(CASE WHEN a THEN 0 ELSE v END AS DECIMAL(18,6))) AS DOUBLE) AS sx_b,
        CAST(SUM(CAST(CASE WHEN a THEN v * v ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS sxx_a,
        CAST(SUM(CAST(CASE WHEN a THEN 0 ELSE v * v END AS DECIMAL(18,6))) AS DOUBLE) AS sxx_b
      FROM e),
    m AS (SELECT n_a, n_b,
        sx_a / n_a AS mean_a, sx_b / n_b AS mean_b,
        (sxx_a - sx_a * sx_a / n_a) / (n_a - 1) AS var_a,
        (sxx_b - sx_b * sx_b / n_b) / (n_b - 1) AS var_b
      FROM m0)
    """
}
