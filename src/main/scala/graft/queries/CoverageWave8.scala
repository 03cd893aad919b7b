package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.aggregates.{BitmapAggregates => B}
import graft.operators.{RowOrder, SessionAnalysis}
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
    // values (not just their roundings) are identical. Only the FINAL
    // projection casts back to DOUBLE (raw decimal output columns are
    // not representation-hash-stable across engines — graft.Num.dq).
    QueryDef(
      "scalar_decimal_casts",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag,
            CAST(CAST(SUM(toDecimal64(l_extendedprice, 2)
              * (toDecimal32('1.00', 2) - toDecimal32(l_discount, 2))) AS DECIMAL(18,4)) AS DOUBLE) AS disc_revenue,
            CAST(CAST(SUM(toDecimal64OrZero(CAST(l_quantity AS STRING), 2)) AS DECIMAL(18,2)) AS DOUBLE) AS qty_sum,
            CAST(CAST(SUM(toDecimal64OrNull(CAST(l_tax AS STRING), 2)) AS DECIMAL(18,2)) AS DOUBLE) AS tax_sum,
            CAST(CAST(MAX(toDecimal128(l_extendedprice, 4)) AS DECIMAL(18,4)) AS DOUBLE) AS max_price
          FROM lineitem
          GROUP BY l_returnflag
          ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
          CAST(CAST(SUM(CAST(trunc(l_extendedprice * 100) / 100 AS DECIMAL(18,2))
            * (CAST('1.00' AS DECIMAL(9,2)) - CAST(trunc(l_discount * 100) / 100 AS DECIMAL(9,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS disc_revenue,
          CAST(CAST(SUM(COALESCE(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2)), 0)) AS DECIMAL(18,2)) AS DOUBLE) AS qty_sum,
          CAST(CAST(SUM(TRY_CAST(CAST(l_tax AS VARCHAR) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS tax_sum,
          CAST(CAST(MAX(CAST(trunc(l_extendedprice * 10000) / 10000 AS DECIMAL(38,4))) AS DECIMAL(18,4)) AS DOUBLE) AS max_price
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

    // sessionAnalysis (AggregateFunctionSessionAnalysis.h:135): the
    // per-session (duration, depth, end_event, session_time) tuples
    // over a 30-minute inactivity gap, one row per session. The oracle
    // is the classic lag + cumulative-break sessionization with the
    // same ≥-gap boundary and (ts, event) tiebreak for the end event.
    QueryDef(
      "session_analysis_tuples",
      (s, dir) =>
        SessionAnalysis.sessions(
            Tables(s, dir, "events"),
            col("user_id"), col("ts"), col("event_type"), 1800L * 1000000)
          .orderBy(col("user_id"), col("session_time")),
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
        SELECT user_id, MIN(ts) AS session_time,
          epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
          COUNT(*) AS depth,
          substr(MAX(concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
            ':', event_type)), 22) AS end_event
        FROM g GROUP BY user_id, sid
        ORDER BY user_id, session_time""")),

    // userDistributionMonthly (AggregateFunctionUserDistributionMonthly
    // .h:37): the daily operator's slot grid generalized to calendar
    // months — ARRIVE when the user acted in the month-slot, NEWONE when
    // their first-ever activity (the derived registration) falls in the
    // same slot. 36 months from 1995-01 over the orders table; customers
    // whose first order predates the grid arrive but are never new,
    // exactly the reference's convertTimeToIndex out-of-range behavior.
    QueryDef(
      "user_distribution_monthly",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey").as("cust"),
            trunc(col("o_orderdate"), "month").as("m"))
          .distinct()
        val reg = o.groupBy("cust").agg(min(col("m")).as("regm"))
        o.join(reg, "cust")
          .withColumn("slot",
            months_between(col("m"), lit("1995-01-01").cast("date")).cast("int"))
          .filter(col("slot").between(0, 35))
          .withColumn("state",
            lit(1) + when(col("m") === col("regm"), 2).otherwise(0))
          .groupBy(col("slot"))
          .agg(count(lit(1)).as("arrive_users"),
            sum(when(col("state") === 3, 1L).otherwise(0L)).as("new_users"))
          .orderBy(col("slot"))
      },
      Some("""
        WITH o AS (SELECT DISTINCT o_custkey AS cust,
            date_trunc('month', o_orderdate) AS m FROM orders),
        reg AS (SELECT cust, MIN(m) AS regm FROM o GROUP BY cust),
        slots AS (
          SELECT o.cust, datediff('month', DATE '1995-01-01', o.m) AS slot,
            CASE WHEN o.m = reg.regm THEN 3 ELSE 1 END AS state
          FROM o JOIN reg ON o.cust = reg.cust
          WHERE datediff('month', DATE '1995-01-01', o.m) BETWEEN 0 AND 35)
        SELECT CAST(slot AS INT) AS slot,
          COUNT(*) AS arrive_users,
          CAST(SUM(CASE WHEN state = 3 THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        FROM slots GROUP BY slot ORDER BY slot""")),

    // funnelPathSplitByTimes (reference
    // AggregateFunctionFunnelPathSplitByTimes.h:140): one path per
    // funnel run — every signup opens a bucket, level events advance
    // the oldest eligible bucket, common events replicate to every
    // window-reachable one. The per-node content has no SQL oracle
    // (FunnelPathSplitByTimesSpec holds five hand-traced reference
    // cases plus a shuffle-order invariance gate); the gate checks the
    // STRUCTURAL invariants the bucket rules imply — one run per
    // signup, every run starting at the signup level, path lengths
    // within the declared cap — which ARE oracle-expressible.
    QueryDef(
      "funnel_path_split_by_times",
      (s, dir) => {
        import graft.aggregates.FunnelPathSplitByTimesAgg.funnelPathSplitByTimes
        val f = funnelPathSplitByTimes(2L * 86400 * 1000000, 8, 3) _
        Tables(s, dir, "events")
          .withColumn("idx",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3).otherwise(0))
          .groupBy(col("user_id"))
          .agg(f(Tables.tsUs(col("ts")), col("idx"), col("event_type"))
            .as("paths"))
          .select(col("user_id"), posexplode(col("paths")).as(Seq("run_pos", "path")))
          .select(col("user_id"), col("run_pos"),
            posexplode(col("path")).as(Seq("node_pos", "node")))
          .select(col("user_id"), col("run_pos"), col("node_pos"),
            col("node.ev").as("ev"))
          .groupBy(col("user_id"))
          .agg(countDistinct(col("run_pos")).as("n_runs"),
               sum(when(col("node_pos") === 0 && col("ev") === 1, 1L)
                 .otherwise(0L)).as("signup_led_runs"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_led_runs
        FROM events
        GROUP BY user_id
        HAVING SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 0
        ORDER BY user_id""")),

    // URL-family completion (reference src/Functions/URL/ — every
    // function in the directory now has a spelling): authority parts,
    // path/query composition, parameter surgery and the hierarchy
    // prefixes, all over synthesized URLs the oracle reconstructs from
    // the same nation-derived parts.
    QueryDef(
      "url_functions_extended",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          WITH b AS (
            SELECT n_nationkey AS k,
              concat('https://u', n_nationkey, '@www.',
                regexp_replace(lower(n_name), '[^a-z0-9]', '-'), '.com:', 8000 + n_nationkey,
                '/a', n_nationkey, '/b?x=', n_nationkey, '&y=2#f', n_nationkey) AS url,
              regexp_replace(lower(n_name), '[^a-z0-9]', '-') AS hn
            FROM nation)
          SELECT k,
            domainWithoutWWW(url) AS dww,
            netloc(url) AS netloc_v,
            port(url) AS port_v,
            pathFull(url) AS path_full,
            queryStringAndFragment(url) AS qsf,
            basename(url) AS base,
            cutURLParameter(url, 'x') AS cut_x,
            array_join(extractURLParameterNames(url), ':') AS names_joined,
            element_at(URLPathHierarchy(url), 2) AS hier2,
            size(URLHierarchy(url)) AS hier_n
          FROM b ORDER BY k""")
      },
      Some("""
        WITH b AS (SELECT n_nationkey AS k,
          regexp_replace(lower(n_name), '[^a-z0-9]', '-', 'g') AS hn FROM nation)
        SELECT k,
          hn || '.com' AS dww,
          'u' || k || '@www.' || hn || '.com:' || (8000 + k) AS netloc_v,
          CAST(8000 + k AS INT) AS port_v,
          '/a' || k || '/b?x=' || k || '&y=2#f' || k AS path_full,
          'x=' || k || '&y=2#f' || k AS qsf,
          'b?x=' || k || '&y=2#f' || k AS base,
          'https://u' || k || '@www.' || hn || '.com:' || (8000 + k) ||
            '/a' || k || '/b?y=2#f' || k AS cut_x,
          'x:y' AS names_joined,
          '/a' || k || '/b?' AS hier2,
          CAST(4 AS INT) AS hier_n
        FROM b ORDER BY k""")),

    // Extremes (the reference's extremes=1 two-row min/max decoration,
    // ExtremesTransform.cpp) — previously the one deliberate coverage
    // "no"; carried as a result-frame decorator with a __row_kind
    // column standing in for the wire protocol's extremes block.
    QueryDef(
      "extremes_decoration",
      (s, dir) => {
        val agg = Tables(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("cnt"), sum(col("n_nationkey")).as("skey"))
        graft.tools.Extremes.withExtremes(agg)
          .orderBy(col("__row_kind"), col("n_regionkey"))
      },
      Some("""
        WITH a AS (
          SELECT n_regionkey, COUNT(*) AS cnt,
            CAST(SUM(n_nationkey) AS BIGINT) AS skey
          FROM nation GROUP BY 1)
        SELECT n_regionkey, cnt, skey, 'result' AS __row_kind FROM a
        UNION ALL SELECT MIN(n_regionkey), MIN(cnt), MIN(skey), 'min' FROM a
        UNION ALL SELECT MAX(n_regionkey), MAX(cnt), MAX(skey), 'max' FROM a
        ORDER BY __row_kind, n_regionkey""")),

    // REAL multimodal decode (graft.multimodal.MediaCodecs — RIFF/PCM
    // WAV and 24 bpp BMP are pure byte parsing, no codec library):
    // payloads are ENCODED from doc_id-derived parameters in one
    // projection and DECODED in the next, so the DuckDB oracle can
    // recompute every output from doc_id arithmetic alone — a full
    // hash-match on the decoder outputs. A square wave makes RMS/peak
    // exactly amplitude/32768; a solid BMP makes channel means exact
    // and the average-hash canonically zero.
    QueryDef(
      "multimodal_codec_roundtrip",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val d = Tables(s, dir, "documents")
          .select(col("doc_id")).filter(col("doc_id") < 500)
        d.withColumn("wav", Multimodal.encodeWavSquare(
            lit(8000) + (col("doc_id") % 3) * 4000,
            lit(100) + col("doc_id") % 400,
            lit(1000) + col("doc_id") % 5000))
          .withColumn("bmp", Multimodal.encodeBmpSolid(
            lit(8) + col("doc_id") % 25, lit(4) + col("doc_id") % 13,
            col("doc_id") % 256, (col("doc_id") * 3) % 256, (col("doc_id") * 7) % 256))
          .select(col("doc_id"),
            Multimodal.wavSampleRate(col("wav")).as("sample_rate"),
            Multimodal.wavFrames(col("wav")).as("n_frames"),
            Num.dq6(Multimodal.wavDurationMs(col("wav"))).as("duration_ms"),
            (Multimodal.wavRms(col("wav")) * 32768).cast("bigint").as("rms_raw"),
            (Multimodal.wavPeak(col("wav")) * 32768).cast("bigint").as("peak_raw"),
            Multimodal.bmpWidth(col("bmp")).as("w"),
            Multimodal.bmpHeight(col("bmp")).as("h"),
            element_at(Multimodal.bmpMeanRgb(col("bmp")), 1).cast("bigint").as("mean_r"),
            element_at(Multimodal.bmpMeanRgb(col("bmp")), 2).cast("bigint").as("mean_g"),
            element_at(Multimodal.bmpMeanRgb(col("bmp")), 3).cast("bigint").as("mean_b"),
            Multimodal.bmpAHash(col("bmp")).as("ahash"),
            // real resize: solid images keep exact channel means
            Multimodal.bmpWidth(Multimodal.bmpResize(col("bmp"), lit(5), lit(3)))
              .as("resized_w"),
            element_at(Multimodal.bmpMeanRgb(
              Multimodal.bmpResize(col("bmp"), lit(5), lit(3))), 1)
              .cast("bigint").as("resized_mean_r"),
            // windowed energy of a square wave: every window exactly A
            (element_at(Multimodal.wavEnergyProfile(col("wav"), lit(4)), 3) * 32768)
              .cast("bigint").as("energy_w3"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
          CAST(CAST(ROUND((100 + doc_id % 400) * 1000.0
            / (8000 + (doc_id % 3) * 4000), 6) AS DECIMAL(18,6)) AS DOUBLE) AS duration_ms,
          CAST(1000 + doc_id % 5000 AS BIGINT) AS rms_raw,
          CAST(1000 + doc_id % 5000 AS BIGINT) AS peak_raw,
          CAST(8 + doc_id % 25 AS INT) AS w,
          CAST(4 + doc_id % 13 AS INT) AS h,
          CAST(doc_id % 256 AS BIGINT) AS mean_r,
          CAST((doc_id * 3) % 256 AS BIGINT) AS mean_g,
          CAST((doc_id * 7) % 256 AS BIGINT) AS mean_b,
          CAST(0 AS BIGINT) AS ahash,
          CAST(5 AS INT) AS resized_w,
          CAST(doc_id % 256 AS BIGINT) AS resized_mean_r,
          CAST(1000 + doc_id % 5000 AS BIGINT) AS energy_w3
        FROM documents WHERE doc_id < 500
        ORDER BY doc_id""")),

    // multiSearch family over the documents corpus (reference
    // MultiSearchImpl.h): any-needle flag, leftmost match position and
    // the 1-based index of the leftmost-matching needle, aggregated per
    // language. The oracle derives the same three from per-needle instr.
    QueryDef(
      "text_multisearch",
      (s, dir) => {
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql("""
          SELECT lang,
            CAST(SUM(IF(multiSearchAny(text, array('table', 'spark', 'window')), 1, 0)) AS BIGINT) AS any_hits,
            CAST(SUM(multiSearchFirstPosition(text, array('table', 'spark', 'window'))) AS BIGINT) AS pos_sum,
            CAST(SUM(multiSearchFirstIndex(text, array('table', 'spark', 'window'))) AS BIGINT) AS idx_sum
          FROM documents GROUP BY lang ORDER BY lang""")
      },
      Some("""
        WITH p AS (
          SELECT lang,
            instr(text, 'table') AS p1, instr(text, 'spark') AS p2,
            instr(text, 'window') AS p3
          FROM documents),
        m AS (
          SELECT lang, p1, p2, p3,
            COALESCE(LEAST(NULLIF(p1, 0), NULLIF(p2, 0), NULLIF(p3, 0)), 0) AS pos
          FROM p)
        SELECT lang,
          CAST(SUM(CASE WHEN pos > 0 THEN 1 ELSE 0 END) AS BIGINT) AS any_hits,
          CAST(SUM(pos) AS BIGINT) AS pos_sum,
          CAST(SUM(CASE WHEN pos = 0 THEN 0 WHEN p1 = pos THEN 1
                        WHEN p2 = pos THEN 2 ELSE 3 END) AS BIGINT) AS idx_sum
        FROM m GROUP BY lang ORDER BY lang""")),

    // finderGroupFunnelByTimes (reference
    // AggregateFunctionFinderGroupFunnelByTimes.h:769): repeat-run
    // funnel counts split by an event-property group — the same
    // composition as finder_group_funnel (chain-start events keep their
    // property bucket, continuations replicate to every bucket) over
    // the ByTimes greedy consume-and-restart aggregate. No SQL oracle
    // exists for the greedy semantics → golden-vector pinned; the underlying
    // aggregate's hand-traced reference cases gate the algorithm.
    QueryDef(
      "finder_group_funnel_by_times",
      (s, dir) => {
        import graft.aggregates.FinderFunnelByTimesAgg.finderFunnelByTimes
        val dayUs = 86400L * 1000000
        val startUs = 1704067200L * 1000000 // 2024-01-01 UTC
        val f = finderFunnelByTimes(startUs, dayUs, 30, 12L * 3600 * 1000000, 3) _
        val ev = Tables(s, dir, "events")
          .withColumn("step",
            when(col("event_type") === "signup", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3).otherwise(0))
          .filter(col("step") > 0)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        val grpOf = when(col("k") < 33, "low")
          .when(col("k") < 67, "mid").otherwise("high")
        val expanded = ev.withColumn("grp",
          explode(when(col("step") === 1, array(grpOf))
            .otherwise(array(lit("low"), lit("mid"), lit("high")))))
        expanded.groupBy(col("user_id"), col("grp"))
          .agg(f(Tables.tsUs(col("ts")), col("step")).as("counts"))
          .select(col("grp"), posexplode(col("counts")).as(Seq("idx", "runs")))
          .groupBy(col("idx"), col("grp")).agg(sum(col("runs")).as("runs"))
          .select(((col("idx") / 3).cast("int") - 1).as("slot"),
            (col("idx") % 3 + 1).cast("int").as("level"),
            col("grp"), col("runs"))
          .filter(col("runs") > 0)
          .orderBy(col("slot"), col("level"), col("grp"))
      },
      // GOLDEN VECTOR oracle: deterministic function of the events table
      // (greedy funnel-run semantics, no SQL counterpart); algorithm gated
      // by hand-traced reference cases in AggregatorsSpec. sf0.01 ONLY.
      Some("""
        SELECT CAST(slot AS INTEGER) AS slot, CAST(level AS INTEGER) AS level,
          grp, CAST(runs AS BIGINT) AS runs FROM (VALUES
          (-1,1,'high',676), (-1,1,'low',652), (-1,1,'mid',689), (-1,2,'high',132), (-1,2,'low',119), (-1,2,'mid',141),
          (-1,3,'high',9), (-1,3,'low',13), (-1,3,'mid',21), (0,1,'high',20), (0,1,'low',23), (0,1,'mid',25),
          (0,2,'high',6), (0,2,'low',4), (0,2,'mid',5), (0,3,'mid',2), (1,1,'high',27), (1,1,'low',18),
          (1,1,'mid',23), (1,2,'high',5), (1,2,'low',4), (1,2,'mid',6), (1,3,'high',2), (1,3,'low',1),
          (1,3,'mid',1), (2,1,'high',19), (2,1,'low',23), (2,1,'mid',21), (2,2,'high',7), (2,2,'low',6),
          (2,2,'mid',1), (2,3,'high',1), (2,3,'low',2), (2,3,'mid',1), (3,1,'high',18), (3,1,'low',23),
          (3,1,'mid',19), (3,2,'high',3), (3,2,'low',3), (3,2,'mid',6), (3,3,'low',1), (3,3,'mid',1),
          (4,1,'high',19), (4,1,'low',24), (4,1,'mid',21), (4,2,'high',4), (4,2,'low',5), (4,2,'mid',6),
          (4,3,'low',1), (4,3,'mid',1), (5,1,'high',22), (5,1,'low',20), (5,1,'mid',32), (5,2,'high',5),
          (5,2,'low',6), (5,2,'mid',8), (5,3,'low',1), (5,3,'mid',1), (6,1,'high',25), (6,1,'low',18),
          (6,1,'mid',20), (6,2,'high',3), (6,2,'low',4), (6,2,'mid',3), (7,1,'high',19), (7,1,'low',20),
          (7,1,'mid',24), (7,2,'high',3), (7,2,'low',3), (7,2,'mid',4), (8,1,'high',14), (8,1,'low',20),
          (8,1,'mid',21), (8,2,'high',3), (8,2,'low',4), (8,2,'mid',3), (9,1,'high',28), (9,1,'low',25),
          (9,1,'mid',28), (9,2,'high',6), (9,2,'low',6), (9,2,'mid',2), (10,1,'high',28), (10,1,'low',16),
          (10,1,'mid',23), (10,2,'high',5), (10,2,'low',4), (10,2,'mid',6), (10,3,'high',1), (10,3,'low',1),
          (10,3,'mid',1), (11,1,'high',23), (11,1,'low',29), (11,1,'mid',21), (11,2,'high',6), (11,2,'low',4),
          (11,2,'mid',4), (11,3,'high',1), (11,3,'mid',1), (12,1,'high',20), (12,1,'low',21), (12,1,'mid',30),
          (12,2,'high',2), (12,2,'low',2), (12,2,'mid',6), (12,3,'high',1), (12,3,'low',1), (13,1,'high',29),
          (13,1,'low',29), (13,1,'mid',25), (13,2,'high',4), (13,2,'low',5), (13,2,'mid',5), (13,3,'low',1),
          (13,3,'mid',1), (14,1,'high',24), (14,1,'low',21), (14,1,'mid',21), (14,2,'high',5), (14,2,'low',6),
          (14,2,'mid',5), (15,1,'high',16), (15,1,'low',15), (15,1,'mid',24), (15,2,'high',5), (15,2,'low',4),
          (15,2,'mid',4), (16,1,'high',24), (16,1,'low',20), (16,1,'mid',20), (16,2,'high',4), (16,2,'low',4),
          (16,2,'mid',3), (17,1,'high',36), (17,1,'low',22), (17,1,'mid',21), (17,2,'high',5), (17,2,'low',1),
          (17,2,'mid',9), (17,3,'mid',2), (18,1,'high',22), (18,1,'low',20), (18,1,'mid',13), (18,2,'high',4),
          (18,2,'low',3), (18,2,'mid',3), (18,3,'high',2), (19,1,'high',25), (19,1,'low',22), (19,1,'mid',30),
          (19,2,'high',5), (19,2,'low',3), (19,2,'mid',3), (19,3,'low',1), (20,1,'high',25), (20,1,'low',23),
          (20,1,'mid',25), (20,2,'high',4), (20,2,'low',4), (20,2,'mid',5), (20,3,'low',1), (20,3,'mid',1),
          (21,1,'high',23), (21,1,'low',26), (21,1,'mid',19), (21,2,'high',6), (21,2,'low',4), (21,2,'mid',4),
          (21,3,'high',1), (21,3,'mid',1), (22,1,'high',18), (22,1,'low',22), (22,1,'mid',22), (22,2,'high',5),
          (22,2,'low',1), (22,2,'mid',4), (22,3,'mid',1), (23,1,'high',17), (23,1,'low',14), (23,1,'mid',31),
          (23,2,'high',4), (23,2,'low',4), (23,2,'mid',8), (23,3,'mid',1), (24,1,'high',21), (24,1,'low',26),
          (24,1,'mid',24), (24,2,'high',3), (24,2,'low',4), (24,2,'mid',1), (25,1,'high',29), (25,1,'low',21),
          (25,1,'mid',19), (25,2,'high',7), (25,2,'low',6), (25,2,'mid',4), (25,3,'low',1), (25,3,'mid',2),
          (26,1,'high',25), (26,1,'low',23), (26,1,'mid',18), (26,2,'high',4), (26,2,'low',6), (26,2,'mid',4),
          (27,1,'high',15), (27,1,'low',26), (27,1,'mid',29), (27,2,'high',3), (27,2,'low',4), (27,2,'mid',8),
          (27,3,'low',1), (27,3,'mid',1), (28,1,'high',24), (28,1,'low',17), (28,1,'mid',18), (28,2,'high',5),
          (28,2,'low',1), (28,2,'mid',6), (28,3,'mid',1), (29,1,'high',21), (29,1,'low',25), (29,1,'mid',22),
          (29,2,'high',1), (29,2,'low',4), (29,2,'mid',5), (29,3,'mid',1)) AS t(slot, level, grp, runs) ORDER BY 1, 2, 3""")),

    // bitmapHasAll / bitmapHasAny / subBitmap (reference
    // FunctionsBitmap.h:1832,713): subset predicates + the
    // position-sliced sub-bitmap over the Roaring64 user segments.
    // The slice is by sorted element position (not value), so the
    // oracle ranks click users by id and windows rows 11..35.
    QueryDef(
      "bitmap_subset_slice",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val click = ev.filter(col("event_type") === "click")
          .agg(B.groupBitmap(col("user_id")).as("bm_click"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .agg(B.groupBitmap(col("user_id")).as("bm_purchase"))
        click.crossJoin(purchase).select(
          B.bitmapHasAll(col("bm_click"), col("bm_purchase")).as("purchase_subset_click"),
          B.bitmapHasAll(col("bm_purchase"), col("bm_click")).as("click_subset_purchase"),
          B.bitmapHasAny(col("bm_click"), col("bm_purchase")).as("any_overlap"),
          B.bitmapCardinality(
            B.subBitmap(col("bm_click"), lit(10L), lit(25L))).as("slice_card"),
          B.bitmapAndCardinality(
            B.subBitmap(col("bm_click"), lit(10L), lit(25L)),
            col("bm_purchase")).as("slice_purchasers"))
      },
      Some("""
        WITH s AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
          FROM events GROUP BY user_id),
        ck AS (
          SELECT user_id, p, ROW_NUMBER() OVER (ORDER BY user_id) AS rn
          FROM s WHERE c = 1)
        SELECT
          (SELECT COUNT(*) FROM s WHERE p = 1 AND c = 0) = 0 AS purchase_subset_click,
          (SELECT COUNT(*) FROM s WHERE c = 1 AND p = 0) = 0 AS click_subset_purchase,
          (SELECT COUNT(*) FROM s WHERE c = 1 AND p = 1) > 0 AS any_overlap,
          (SELECT COUNT(*) FROM ck WHERE rn > 10 AND rn <= 35) AS slice_card,
          (SELECT COUNT(*) FROM ck WHERE rn > 10 AND rn <= 35 AND p = 1) AS slice_purchasers""")),

    // Round-6 wave-7 spellings: tuple access, Monday/time-of-day date
    // shorthands, token/split families, map series fill, and an AES
    // encrypt→decrypt round-trip (the oracle sees the identity).
    QueryDef(
      "scalar_wave7_misc",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""
          SELECT n_nationkey AS k,
            tupleElement(tuple(n_name, n_regionkey), 1) AS t_name,
            tupleElement(tuple(n_name, n_regionkey), 2) AS t_region,
            toMonday(addDays(DATE '2024-01-01', n_nationkey * 3)) AS mon,
            toTime(addHours(TIMESTAMP '2024-01-01 00:00:00', n_nationkey * 7)) AS tod,
            array_join(alphaTokens(concat(n_name, '1', n_name)), '|') AS alpha,
            array_join(ngrams(substr(n_name, 1, 4), 2), '|') AS grams,
            array_join(splitByRegexp('[0-9]+', concat('x', CAST(n_nationkey AS STRING), 'y')), '|') AS splitre,
            positionCaseInsensitiveUTF8(n_name, 'an') AS pos_an,
            element_at(mapPopulateSeries(
              map(1, CAST(n_nationkey AS INT), CAST(n_nationkey % 3 + 2 AS INT), 9)), 2) AS mps2,
            decrypt('aes-128-ecb',
              encrypt('aes-128-ecb', n_name, '1234567890123456'),
              '1234567890123456') AS aes_roundtrip
          FROM nation ORDER BY k""")
      },
      Some("""
        SELECT n_nationkey AS k,
          n_name AS t_name,
          n_regionkey AS t_region,
          date_trunc('week', DATE '2024-01-01' + to_days(n_nationkey * 3)) AS mon,
          TIMESTAMP '1970-01-02 00:00:00'
            + (TIMESTAMP '2024-01-01 00:00:00' + to_hours(n_nationkey * 7)
               - date_trunc('day', TIMESTAMP '2024-01-01 00:00:00' + to_hours(n_nationkey * 7))) AS tod,
          array_to_string(regexp_extract_all(concat(n_name, '1', n_name), '[a-zA-Z]+'), '|') AS alpha,
          CASE WHEN length(substr(n_name, 1, 4)) < 2 THEN ''
               ELSE array_to_string([substr(substr(n_name, 1, 4), i, 2)
                 FOR i IN range(1, length(substr(n_name, 1, 4)))], '|') END AS grams,
          array_to_string(string_split_regex(concat('x', CAST(n_nationkey AS VARCHAR), 'y'), '[0-9]+'), '|') AS splitre,
          instr(lower(n_name), 'an') AS pos_an,
          CASE WHEN n_nationkey % 3 + 2 = 2 THEN 9 ELSE 0 END AS mps2,
          n_name AS aes_roundtrip
        FROM nation ORDER BY k""")),

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
            col("rev0").cast(Num.D2).cast("double").as("rev"),
            RowOrder.runningAccumulate(sum(col("rev0")),
              Seq(col("prio")), Seq(col("yr"))).cast(Num.D2).cast("double").as("cum_rev"))
          .orderBy(col("prio"), col("yr"))
      },
      Some("""
        WITH y AS (
          SELECT o_orderpriority AS prio, CAST(YEAR(o_orderdate) AS INT) AS yr,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
          FROM orders GROUP BY 1, 2)
        SELECT prio, yr, CAST(rev AS DOUBLE) AS rev,
          CAST(CAST(SUM(rev) OVER (PARTITION BY prio ORDER BY yr) AS DECIMAL(18,2)) AS DOUBLE) AS cum_rev
        FROM y ORDER BY prio, yr"""))
  )
}
