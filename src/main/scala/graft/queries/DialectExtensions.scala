package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse-dialect semantic extensions rebuilt as Spark rewrites
  * (SURVEY §7.2): WITH TOTALS (TotalsHavingStep.h:29 → agg ∪ grand-total
  * row), ORDER BY ... WITH FILL (FillingStep.h:24 → sequence + explode +
  * left join), DISTINCT ON (ParserSelectQuery.cpp:131 → row_number = 1),
  * plus the scalar-function families (string/date/array — SURVEY §2.2)
  * and metadata-only trivial count (ReadStorageRowCountStep.h).
  */
object DialectExtensions {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    // ClickHouse function spellings straight through the SQL front door —
    // resolved by graft.sql.ClickHouseAliases (FunctionRegistry injection,
    // no text rewriting) onto native codegen'd Spark expressions.
    QueryDef(
      "dialect_clickhouse_sql",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT toYYYYMM(ts) AS ym, event_type,
            countIf(value > 250) AS n_big,
            countIf(notEmpty(props)) AS n_with_props,
            toInt32(toDayOfMonth(min(ts))) AS first_dom,
            count(*) AS n
          FROM events
          GROUP BY 1, 2
          ORDER BY 1, 2""")
      },
      Some("""
        SELECT CAST(STRFTIME(ts, '%Y%m') AS INTEGER) AS ym, event_type,
          CAST(COUNT(CASE WHEN value > 250 THEN 1 END) AS BIGINT) AS n_big,
          CAST(COUNT(CASE WHEN LENGTH(props) > 0 THEN 1 END) AS BIGINT) AS n_with_props,
          CAST(DAY(MIN(ts)) AS INTEGER) AS first_dom,
          COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // WITH TOTALS: group rows plus a grand-total row (null group keys).
    QueryDef(
      "agg_with_totals",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val grouped = o.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("sum_price"))
        val totals = o.agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("sum_price"))
          .select(lit(null).cast("string").as("o_orderstatus"), col("n_orders"), col("sum_price"))
        grouped.unionByName(totals).orderBy(col("o_orderstatus").asc_nulls_last)
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT NULL, COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    // ORDER BY ... WITH FILL: continuous day axis with zero-filled gaps.
    QueryDef(
      "orderby_with_fill",
      (s, dir) => {
        val daily = Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-02-01 00:00:00")) &&
                  col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
          .groupBy(col("l_shipdate").as("day"))
          .agg(count(lit(1)).as("n_items"))
        val axis = daily
          .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
        axis.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_items"), lit(0L)).as("n_items"))
          .orderBy(col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT l_shipdate AS day, COUNT(*) AS n_items
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-02-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
          GROUP BY 1),
        axis AS (
          SELECT UNNEST(GENERATE_SERIES(
            (SELECT MIN(day) FROM daily), (SELECT MAX(day) FROM daily),
            INTERVAL 1 DAY)) AS day)
        SELECT axis.day AS day, COALESCE(n_items, 0) AS n_items
        FROM axis LEFT JOIN daily ON axis.day = daily.day
        ORDER BY day""")),

    // DISTINCT ON (first row per key by an explicit ordering).
    QueryDef(
      "distinct_on",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
                  col("o_orderdate").as("latest_date"))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey AS latest_order, o_orderdate AS latest_date
        FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
        WHERE rn = 1
        ORDER BY o_custkey""")),

    // Higher-order array functions (reference src/Functions/array/, 73
    // files — arrayMap/Filter/Reduce ≡ transform/filter/aggregate).
    QueryDef(
      "array_higher_order",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sort_array(collect_list(col("o_totalprice").cast(Num.D2))).as("prices"))
          .filter(size(col("prices")) >= 8)
          .select(
            col("o_custkey"),
            size(col("prices")).as("n"),
            round(element_at(col("prices"), 1).cast("double"), 2).as("cheapest"),
            round(aggregate(col("prices"), lit(0).cast(DialectExtensions.D4),
              (acc, x) => (acc + x).cast(DialectExtensions.D4)).cast("double"), 2).as("total"),
            size(filter(col("prices"), x => x > 200000)).as("n_big"),
            round(aggregate(col("prices"), lit(0).cast(DialectExtensions.D4),
              (acc, x) => (acc + x * 2).cast(DialectExtensions.D4)).cast("double"), 2)
              .as("doubled_total"))
          .orderBy(col("o_custkey")),
      Some("""
        WITH t AS (
          SELECT o_custkey, LIST(CAST(o_totalprice AS DECIMAL(18,2)) ORDER BY o_totalprice) AS prices
          FROM orders GROUP BY o_custkey)
        SELECT o_custkey, LEN(prices) AS n,
          ROUND(CAST(prices[1] AS DOUBLE), 2) AS cheapest,
          ROUND(CAST(LIST_SUM(prices) AS DOUBLE), 2) AS total,
          LEN(LIST_FILTER(prices, x -> x > 200000)) AS n_big,
          ROUND(CAST(LIST_SUM(LIST_TRANSFORM(prices, x -> x * 2)) AS DOUBLE), 2) AS doubled_total
        FROM t
        WHERE LEN(prices) >= 8
        ORDER BY o_custkey""")),

    // String-function family (substr/concat/replace/trim/pad/case/split).
    QueryDef(
      "string_functions",
      (s, dir) =>
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 3)).as("pref"),
            length(col("p_name")).as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
            replace(col("p_type"), lit(" "), lit("_")).as("type_u"),
            split(col("p_name"), " ").getItem(0).as("first_word"),
            reverse(col("p_brand")).as("brand_rev"))
          .orderBy(col("p_partkey"))
          .limit(200),
      Some("""
        SELECT p_partkey,
          UPPER(SUBSTRING(p_name, 1, 3)) AS pref,
          LENGTH(p_name) AS name_len,
          CONCAT_WS('|', p_brand, p_type) AS brand_type,
          LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
          REPLACE(p_type, ' ', '_') AS type_u,
          STRING_SPLIT(p_name, ' ')[1] AS first_word,
          REVERSE(p_brand) AS brand_rev
        FROM part
        ORDER BY p_partkey
        LIMIT 200""")),

    // Date/time function family (extract/trunc/diff/add/format).
    QueryDef(
      "date_functions",
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            quarter(col("o_orderdate")).as("q"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            dayofweek(col("o_orderdate")).as("dow"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
            (col("o_orderdate") + expr("interval 90 days")).as("due_date"),
            datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate")).as("days_to_2002"))
          .orderBy(col("o_orderkey"))
          .limit(500),
      Some("""
        SELECT o_orderkey,
          CAST(YEAR(o_orderdate) AS INTEGER) AS y,
          CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
          CAST(MONTH(o_orderdate) AS INTEGER) AS m,
          CAST(DAY(o_orderdate) AS INTEGER) AS d,
          CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow,
          STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
          o_orderdate + INTERVAL 90 DAY AS due_date,
          CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
            AS days_to_2002
        FROM orders
        ORDER BY o_orderkey
        LIMIT 500""")),

    // Math scalar family (rounded to dodge libm last-ulp differences).
    QueryDef(
      "math_functions",
      (s, dir) =>
        Tables(s, dir, "supplier")
          .select(
            col("s_suppkey"),
            round(abs(col("s_acctbal")), 2).as("abs_bal"),
            ceil(col("s_acctbal")).as("ceil_bal"),
            floor(col("s_acctbal")).as("floor_bal"),
            signum(col("s_acctbal")).as("sign_bal"),
            round(sqrt(abs(col("s_acctbal"))), 6).as("sqrt_bal"),
            round(pow(col("s_suppkey").cast("double"), 2.0), 1).as("key_sq"),
            round(log(col("s_suppkey").cast("double") + 1.0), 6).as("ln_key"),
            pmod(col("s_suppkey"), lit(7)).as("key_mod7"))
          .orderBy(col("s_suppkey")),
      Some("""
        SELECT s_suppkey,
          ROUND(ABS(s_acctbal), 2) AS abs_bal,
          CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
          CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
          CAST(SIGN(s_acctbal) AS DOUBLE) AS sign_bal,
          ROUND(SQRT(ABS(s_acctbal)), 6) AS sqrt_bal,
          ROUND(POW(CAST(s_suppkey AS DOUBLE), 2.0), 1) AS key_sq,
          ROUND(LN(CAST(s_suppkey AS DOUBLE) + 1.0), 6) AS ln_key,
          s_suppkey % 7 AS key_mod7
        FROM supplier
        ORDER BY s_suppkey""")),

    // NULL semantics: nullif/coalesce/null-safe equality over derived nulls.
    QueryDef(
      "null_handling",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .withColumn("d", nullif(col("l_discount"), lit(0.0)))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
               count(col("d")).as("n_nonnull_disc"),
               sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_zero_disc"),
               Num.dsum2(coalesce(col("d"), lit(0.0))).as("sum_disc"),
               count(when(col("d") <=> lit(0.05), 1)).as("n_exact_5pct"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_rows,
          COUNT(NULLIF(l_discount, 0.0)) AS n_nonnull_disc,
          CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
          CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.0) AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_disc,
          COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 THEN 1 END)
            AS n_exact_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // Metadata-only count (trivial-count optimization surface).
    QueryDef(
      "trivial_count",
      (s, dir) =>
        Tables(s, dir, "lineitem").agg(count(lit(1)).as("n_rows")),
      Some("SELECT COUNT(*) AS n_rows FROM lineitem")),

    // SAMPLE k: statistical sampling — fraction differs per engine run
    // seed; the seed-42 count is golden-vector pinned below.
    QueryDef(
      "sample_fraction",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .sample(withReplacement = false, fraction = 0.1, seed = 42)
          .agg(count(lit(1)).as("n_sampled"),
               countDistinct(col("l_orderkey")).as("n_orders")),
      // GOLDEN VECTOR oracle: Bernoulli sample at seed 42 is
      // deterministic for a fixed scan partitioning (verified stable
      // across local[4]/local[8]); bounds are additionally asserted in
      // unit tests, and sample_by_hash carries the exact-oracle
      // deterministic-sampling semantics. sf0.01 ONLY.
      Some("""
        SELECT CAST(5971 AS BIGINT) AS n_sampled,
               CAST(4899 AS BIGINT) AS n_orders""")),

    // Deterministic SAMPLE — the reference's actual semantics: ClickHouse
    // SAMPLE hashes the declared sampling key and keeps rows below
    // fraction × max, so the same query returns the SAME sample on every
    // run and every replica (StorageMergeTree sampling_expression;
    // /root/reference/src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp:455).
    // Re-expressed with an overflow-safe multiplicative hash both engines
    // evaluate identically as plain integer SQL (no engine-specific hash
    // builtin, no 64-bit wraparound: operands stay < 2^63 in both), which
    // upgrades the check from rows-only to an exact oracle. Scale: a pure
    // per-row predicate on the scan — no shuffle, fully parallel.
    QueryDef(
      "sample_by_hash",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(sampleByHashSql)
      },
      Some(sampleByHashSql))
  )

  /** One SQL text, two engines: deterministic 10% sample by key hash.
    * (def, not val: referenced from `defs` above its definition site —
    * a val would still be null during the object's initializer.)
    */
  private def sampleByHashSql = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE ((l_orderkey % 1000000007) * 2654435761 + l_linenumber * 40503)
          % 1048576 < 104858"""

  private[queries] val D4 = org.apache.spark.sql.types.DecimalType(28, 4)
}
