package graft.queries

import graft.{QueryDef, Tables}

/** Sixth TPC-DS shape wave (reference plan-gate corpus
  * /root/reference/src/Optimizer/tests/gtest_plan_check_tpcds1000.cpp):
  * q88's eight time-band counts and q9's CASE-over-aggregates buckets —
  * both written the way TPC-DS hopes the optimizer will execute them:
  * the N independent per-band subqueries of the benchmark text fused
  * into ONE conditional-aggregate scan of the fact table. At 100 TB
  * this is the difference between 8 fact scans and 1; the golden plan
  * pins the single-Aggregate shape.
  */
object TpcdsShapes6 {

  val defs: Seq[QueryDef] = Seq(

    // q88 shape: eight disjoint time bands, each counting filtered
    // traffic — one scan, eight conditional counts, one output row.
    QueryDef(
      "tpcds_timeband_counts",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT
            COUNT(CASE WHEN h >= 0  AND h < 3  THEN 1 END) AS band1,
            COUNT(CASE WHEN h >= 3  AND h < 6  THEN 1 END) AS band2,
            COUNT(CASE WHEN h >= 6  AND h < 9  THEN 1 END) AS band3,
            COUNT(CASE WHEN h >= 9  AND h < 12 THEN 1 END) AS band4,
            COUNT(CASE WHEN h >= 12 AND h < 15 THEN 1 END) AS band5,
            COUNT(CASE WHEN h >= 15 AND h < 18 THEN 1 END) AS band6,
            COUNT(CASE WHEN h >= 18 AND h < 21 THEN 1 END) AS band7,
            COUNT(CASE WHEN h >= 21           THEN 1 END) AS band8
          FROM (SELECT hour(ts) AS h FROM events
                WHERE event_type <> 'error' AND user_id % 4 <> 0) t""")
      },
      Some("""
        SELECT
          CAST(COUNT(CASE WHEN h >= 0  AND h < 3  THEN 1 END) AS BIGINT) AS band1,
          CAST(COUNT(CASE WHEN h >= 3  AND h < 6  THEN 1 END) AS BIGINT) AS band2,
          CAST(COUNT(CASE WHEN h >= 6  AND h < 9  THEN 1 END) AS BIGINT) AS band3,
          CAST(COUNT(CASE WHEN h >= 9  AND h < 12 THEN 1 END) AS BIGINT) AS band4,
          CAST(COUNT(CASE WHEN h >= 12 AND h < 15 THEN 1 END) AS BIGINT) AS band5,
          CAST(COUNT(CASE WHEN h >= 15 AND h < 18 THEN 1 END) AS BIGINT) AS band6,
          CAST(COUNT(CASE WHEN h >= 18 AND h < 21 THEN 1 END) AS BIGINT) AS band7,
          CAST(COUNT(CASE WHEN h >= 21           THEN 1 END) AS BIGINT) AS band8
        FROM (SELECT EXTRACT(hour FROM ts) AS h FROM events
              WHERE event_type <> 'error' AND user_id % 4 <> 0) t""")),

    // q9 shape: five quantity buckets; each reports avg extended price
    // when the bucket is populous, avg discount otherwise — CASE over
    // aggregate results, all five buckets from one conditional-aggregate
    // pass. Averages as exact-decimal sum / count (the Num rule), so
    // both engines divide identical operands.
    QueryDef(
      "tpcds_case_buckets",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        // 15 conditional aggregates in ONE pass (no bucket join at all —
        // a 5-row cross join would plan as a nested-loop pair join); the
        // single output row is stacked to bucket rows by exploding an
        // array literal built from the aggregate results.
        def band(i: Int) =
          s"l_quantity >= ${1 + 10 * i} AND l_quantity < ${11 + 10 * i}"
        val aggs = (0 until 5).map(i => s"""
          COUNT(CASE WHEN ${band(i)} THEN 1 END) AS cnt$i,
          CAST(SUM(CASE WHEN ${band(i)}
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sp$i,
          CAST(SUM(CASE WHEN ${band(i)}
            THEN CAST(l_discount AS DECIMAL(18,6)) END) AS DOUBLE) AS sd$i""")
          .mkString(",")
        val structs = (0 until 5).map(i =>
          s"struct(CAST($i AS BIGINT) AS bucket, cnt$i AS cnt, sp$i AS sp, sd$i AS sd)")
          .mkString(", ")
        s.sql(s"""
          WITH a AS (SELECT $aggs FROM lineitem),
          e AS (SELECT explode(array($structs)) AS b FROM a)
          SELECT b.bucket AS bucket,
            CAST(b.cnt AS BIGINT) AS bucket_n,
            ROUND(CASE WHEN b.cnt > 500 THEN b.sp / b.cnt
                       ELSE b.sd / b.cnt END, 6) AS bucket_metric
          FROM e
          ORDER BY bucket""")
      },
      Some("""
        WITH b AS (SELECT UNNEST(generate_series(0, 4)) AS i),
        a AS (
          SELECT
            COUNT(CASE WHEN l_quantity >= 1 + 10 * b.i AND l_quantity < 11 + 10 * b.i
              THEN 1 END) AS cnt,
            CAST(SUM(CASE WHEN l_quantity >= 1 + 10 * b.i AND l_quantity < 11 + 10 * b.i
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price,
            CAST(SUM(CASE WHEN l_quantity >= 1 + 10 * b.i AND l_quantity < 11 + 10 * b.i
              THEN CAST(l_discount AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_disc,
            b.i AS bucket
          FROM lineitem CROSS JOIN b
          GROUP BY b.i)
        SELECT CAST(bucket AS BIGINT) AS bucket,
          CAST(cnt AS BIGINT) AS bucket_n,
          ROUND(CASE WHEN cnt > 500 THEN sum_price / cnt
                     ELSE sum_disc / cnt END, 6) AS bucket_metric
        FROM a
        ORDER BY bucket""")),

    // q41 shape: DISTINCT dimension rows filtered by a correlated EXISTS
    // on the SAME dimension — the brand must also make a differently-
    // typed small part. Plans as a dimension⋈dimension LeftSemi
    // (broadcast, no fact table involved); the decorrelation itself is
    // the TPC-DS point.
    QueryDef(
      "tpcds_dim_exists",
      (s, dir) => {
        Tables(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""
          SELECT DISTINCT p1.p_brand
          FROM part p1
          WHERE p1.p_size BETWEEN 10 AND 20
            AND EXISTS (
              SELECT 1 FROM part p2
              WHERE p2.p_brand = p1.p_brand
                AND p2.p_type <> p1.p_type
                AND p2.p_size < 5)
          ORDER BY p1.p_brand""")
      },
      Some("""
        SELECT DISTINCT p1.p_brand
        FROM part p1
        WHERE p1.p_size BETWEEN 10 AND 20
          AND EXISTS (
            SELECT 1 FROM part p2
            WHERE p2.p_brand = p1.p_brand
              AND p2.p_type <> p1.p_type
              AND p2.p_size < 5)
        ORDER BY p1.p_brand""")),

    // q66 shape: the wide monthly pivot — twelve per-month revenue
    // columns per group from ONE scan of the fact table (TPC-DS writes
    // it as a UNION of per-warehouse subqueries; the fused form is the
    // plan the optimizer should reach). Decimal sums keep the pivot
    // hash-exact.
    QueryDef(
      "tpcds_monthly_pivot",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        val months = (1 to 12).map(m =>
          s"""CAST(SUM(CASE WHEN month(l_shipdate) = $m
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS m$m""")
          .mkString(",\n")
        s.sql(s"""
          SELECT l_returnflag, l_linestatus, year(l_shipdate) AS yr,
                 $months,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem
          WHERE year(l_shipdate) BETWEEN 1994 AND 1996
          GROUP BY 1, 2, 3
          ORDER BY 1, 2, 3""")
      },
      Some {
        val months = (1 to 12).map(m =>
          s"""CAST(SUM(CASE WHEN EXTRACT(month FROM l_shipdate) = $m
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS m$m""")
          .mkString(",\n")
        s"""
        SELECT l_returnflag, l_linestatus,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
               $months,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) BETWEEN 1994 AND 1996
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""
      })
  )
}
