package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.operators.RowOrder
import org.apache.spark.sql.functions._

/** Round-6 coverage wave: the scalar long tail from VERDICT r5 —
  * decimal-typed conversions (toDecimal32/64/128 + OrZero/OrNull), the
  * string replace/split family, firstSignificantSubdomain,
  * formatReadableTimeDelta, mapAdd/mapSubtract, and runningAccumulate.
  *
  * Scale notes: every spelling here lowers to codegen'd scalar
  * expressions evaluated in-scan (the replace -One variants are a
  * static call inside the generated loop); runningAccumulate is one
  * window over the already-aggregated year grid — no new shuffles
  * beyond the group-by that feeds it.
  */
object CoverageWave8 {

  val defs: Seq[QueryDef] = Seq(

    // Decimal-typed conversion family (reference FunctionsConversion.h:
    // 2008): exact-decimal arithmetic parity — the discounted-revenue
    // product runs entirely in DecimalType on both engines, so the
    // values (not just their roundings) are identical.
    QueryDef(
      "scalar_decimal_casts",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag,
            CAST(SUM(toDecimal64(l_extendedprice, 2)
              * (toDecimal32('1.00', 2) - toDecimal32(l_discount, 2))) AS DECIMAL(18,4)) AS disc_revenue,
            CAST(SUM(toDecimal64OrZero(CAST(l_quantity AS STRING), 2)) AS DECIMAL(18,2)) AS qty_sum,
            CAST(SUM(toDecimal64OrNull(CAST(l_tax AS STRING), 2)) AS DECIMAL(18,2)) AS tax_sum,
            CAST(MAX(toDecimal128(l_extendedprice, 4)) AS DECIMAL(18,4)) AS max_price
          FROM lineitem
          GROUP BY l_returnflag
          ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST('1.00' AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DECIMAL(18,4)) AS disc_revenue,
          CAST(SUM(COALESCE(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2)), 0)) AS DECIMAL(18,2)) AS qty_sum,
          CAST(SUM(TRY_CAST(CAST(l_tax AS VARCHAR) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS tax_sum,
          CAST(MAX(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(18,4)) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // replace family + splitByString (reference replaceRegexpAll.cpp,
    // replaceRegexpOne.cpp, replaceOne.cpp, FunctionsStringArray.h).
    // The backref column exercises CH's \N → Java $N conversion.
    QueryDef(
      "text_replace_split",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_nationkey AS k,
            replaceRegexpAll(n_name, '[AEIOU]', '.') AS devowel,
            replaceRegexpAll(n_name, '(.)(.)', '\\2\\1') AS swap_pairs,
            replaceRegexpOne(n_name, '[AEIOU]', '#') AS first_vowel,
            replaceAll(n_name, 'A', '@') AS lit_all,
            replaceOne(n_name, 'A', '@') AS lit_one,
            array_join(splitByString('N', n_name), '|') AS split_n
          FROM nation ORDER BY k""")
      },
      Some("""
        SELECT n_nationkey AS k,
          regexp_replace(n_name, '[AEIOU]', '.', 'g') AS devowel,
          regexp_replace(n_name, '(.)(.)', '\2\1', 'g') AS swap_pairs,
          regexp_replace(n_name, '[AEIOU]', '#') AS first_vowel,
          replace(n_name, 'A', '@') AS lit_all,
          CASE WHEN instr(n_name, 'A') = 0 THEN n_name
               ELSE substr(n_name, 1, instr(n_name, 'A') - 1) || '@' ||
                    substr(n_name, instr(n_name, 'A') + 1) END AS lit_one,
          array_to_string(string_split(n_name, 'N'), '|') AS split_n
        FROM nation ORDER BY k""")),

    // firstSignificantSubdomain over synthesized URLs covering the
    // generic-second-level (com.tr), www, scheme-less, and single-label
    // shapes — every variant must recover the embedded nation label.
    QueryDef(
      "url_first_significant_subdomain",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_nationkey AS k,
            firstSignificantSubdomain(
              CASE CAST(n_nationkey % 4 AS INT)
                WHEN 0 THEN 'https://news.' || replace(lower(n_name), ' ', '-') || '.com.tr/story?id=1'
                WHEN 1 THEN 'http://www.' || replace(lower(n_name), ' ', '-') || '.org/x'
                WHEN 2 THEN replace(lower(n_name), ' ', '-') || '.io'
                ELSE 'https://' || replace(lower(n_name), ' ', '-')
              END) AS fsd,
            firstSignificantSubdomain('https://a.b.co.uk/p') AS fixed_couk
          FROM nation ORDER BY k""")
      },
      Some("""
        SELECT n_nationkey AS k,
          replace(lower(n_name), ' ', '-') AS fsd,
          'b' AS fixed_couk
        FROM nation ORDER BY k""")),

    // formatReadableTimeDelta across the unit ladder (seconds through
    // years); the oracle re-derives the reference's format (365-day
    // years, 30.5-day months, ", " separators with a final " and ").
    QueryDef(
      "scalar_readable_timedelta",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_nationkey AS k,
            formatReadableTimeDelta(n_nationkey * 3671) AS delta_small,
            formatReadableTimeDelta(n_nationkey * 2000003) AS delta_big
          FROM nation ORDER BY k""")
      },
      Some("""
        WITH base AS (
          SELECT n_nationkey AS k, 1 AS which, n_nationkey * 3671 AS v FROM nation
          UNION ALL
          SELECT n_nationkey, 2, n_nationkey * 2000003 FROM nation),
        parts AS (
          SELECT k, which,
            list_filter([
              CASE WHEN v//31536000 > 0 THEN CAST(v//31536000 AS VARCHAR) || ' year' || (CASE WHEN v//31536000 = 1 THEN '' ELSE 's' END) END,
              CASE WHEN (v%31536000)//2635200 > 0 THEN CAST((v%31536000)//2635200 AS VARCHAR) || ' month' || (CASE WHEN (v%31536000)//2635200 = 1 THEN '' ELSE 's' END) END,
              CASE WHEN ((v%31536000)%2635200)//86400 > 0 THEN CAST(((v%31536000)%2635200)//86400 AS VARCHAR) || ' day' || (CASE WHEN ((v%31536000)%2635200)//86400 = 1 THEN '' ELSE 's' END) END,
              CASE WHEN (((v%31536000)%2635200)%86400)//3600 > 0 THEN CAST((((v%31536000)%2635200)%86400)//3600 AS VARCHAR) || ' hour' || (CASE WHEN (((v%31536000)%2635200)%86400)//3600 = 1 THEN '' ELSE 's' END) END,
              CASE WHEN ((((v%31536000)%2635200)%86400)%3600)//60 > 0 THEN CAST(((((v%31536000)%2635200)%86400)%3600)//60 AS VARCHAR) || ' minute' || (CASE WHEN ((((v%31536000)%2635200)%86400)%3600)//60 = 1 THEN '' ELSE 's' END) END,
              CASE WHEN v%60 > 0 THEN CAST(v%60 AS VARCHAR) || ' second' || (CASE WHEN v%60 = 1 THEN '' ELSE 's' END) END
            ], x -> x IS NOT NULL) AS nz
          FROM base),
        fmt AS (
          SELECT k, which,
            CASE WHEN len(nz) = 0 THEN '0 seconds'
                 WHEN len(nz) = 1 THEN nz[1]
                 ELSE array_to_string(nz[1:len(nz)-1], ', ') || ' and ' || nz[len(nz)] END AS fmtd
          FROM parts)
        SELECT k,
          MAX(CASE WHEN which = 1 THEN fmtd END) AS delta_small,
          MAX(CASE WHEN which = 2 THEN fmtd END) AS delta_big
        FROM fmt GROUP BY k ORDER BY k""")),

    // mapAdd / mapSubtract (reference array/mapOp.cpp): key-union merge
    // with absent keys as 0, consumed through element_at so the gate
    // compares scalars.
    QueryDef(
      "map_arithmetic",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          SELECT event_type,
            CAST(SUM(element_at(
              mapAdd(map('a', user_id % 10, 'b', CAST(1 AS BIGINT)),
                     map('b', event_id % 5, 'c', CAST(2 AS BIGINT))), 'b')) AS BIGINT) AS b_sum,
            CAST(SUM(element_at(
              mapSubtract(map('x', user_id % 7), map('x', event_id % 3)), 'x')) AS BIGINT) AS x_sum,
            CAST(SUM(element_at(
              mapAdd(map('a', user_id % 10, 'b', CAST(1 AS BIGINT)),
                     map('b', event_id % 5, 'c', CAST(2 AS BIGINT))), 'c')) AS BIGINT) AS c_sum
          FROM events GROUP BY event_type ORDER BY event_type""")
      },
      Some("""
        SELECT event_type,
          CAST(SUM(1 + event_id % 5) AS BIGINT) AS b_sum,
          CAST(SUM(user_id % 7 - event_id % 3) AS BIGINT) AS x_sum,
          CAST(SUM(2) AS BIGINT) AS c_sum
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // runningAccumulate (reference runningAccumulate.cpp) as the
    // deterministic cumulative window over an explicit order: running
    // yearly revenue per order priority. Exact decimal all the way so
    // the cumulative sums hash identically.
    QueryDef(
      "running_accumulate_revenue",
      (s, dir) => {
        val yearly = Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            year(col("o_orderdate")).cast("int").as("yr"))
          .agg(sum(col("o_totalprice").cast(Num.D2)).as("rev0"))
        yearly.select(
            col("prio"), col("yr"),
            col("rev0").cast(Num.D2).as("rev"),
            RowOrder.runningAccumulate(sum(col("rev0")),
              Seq(col("prio")), Seq(col("yr"))).cast(Num.D2).as("cum_rev"))
          .orderBy(col("prio"), col("yr"))
      },
      Some("""
        WITH y AS (
          SELECT o_orderpriority AS prio, CAST(YEAR(o_orderdate) AS INT) AS yr,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
          FROM orders GROUP BY 1, 2)
        SELECT prio, yr, rev,
          CAST(SUM(rev) OVER (PARTITION BY prio ORDER BY yr) AS DECIMAL(18,2)) AS cum_rev
        FROM y ORDER BY prio, yr"""))
  )
}
