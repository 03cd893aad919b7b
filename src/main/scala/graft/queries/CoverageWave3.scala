package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** Round-2 coverage wave: geo functions (reference
  * src/Functions/GeoHash.cpp), string-distance family
  * (FunctionsStringSimilarity.cpp), bitwise aggregates
  * (AggregateFunctionBitwise.cpp), quantified comparisons (the reference's
  * QUANTIFIED Apply subtype, src/QueryPlan/ApplyStep.h:31-42 — Spark has
  * no ALL/ANY syntax, so they lower to MAX/MIN scalar subqueries), and the
  * WITH TOTALS × HAVING interplay (TotalsHavingTransform.cpp,
  * totals_mode=before_having: the totals row aggregates ALL groups, also
  * the ones HAVING filters out).
  */
object CoverageWave3 {
  import Num._

  val defs: Seq[QueryDef] = Seq(
    // Synthetic sources (reference numbers()/generateRandom table
    // functions, registerTableFunctions.cpp:34-41): spark.range + an
    // arithmetic PRNG both engines can evaluate identically.
    QueryDef(
      "table_function_numbers",
      (s, _) =>
        s.range(0, 10000)
          .withColumn("r", pmod(col("id") * 2654435761L, lit(1000003L)))
          .groupBy((col("id") % 7).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("r")).as("sum_r"),
               min(col("r")).as("min_r"), max(col("r")).as("max_r"))
          .orderBy(col("g")),
      Some("""
        SELECT (id % 7) AS g, COUNT(*) AS n,
          CAST(SUM(r) AS BIGINT) AS sum_r,
          CAST(MIN(r) AS BIGINT) AS min_r, CAST(MAX(r) AS BIGINT) AS max_r
        FROM (SELECT range AS id, (range * 2654435761) % 1000003 AS r
              FROM RANGE(0, 10000))
        GROUP BY 1
        ORDER BY g""")),

    // Geohash encode/decode over synthesized coordinates; cell counts +
    // roundtrip error bound. Rows-only: DuckDB has no geohash, and the
    // bit-interleave is impractical in portable SQL — exactness is
    // covered by unit tests against published geohash vectors.
    QueryDef(
      "geohash_cells",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("user_id")).distinct()
          .withColumn("lat", (pmod(col("user_id") * 37, lit(17000)) / 100.0) - 85.0)
          .withColumn("lon", (pmod(col("user_id") * 91, lit(35000)) / 100.0) - 175.0)
          .withColumn("gh", GeoFunctions.geohashEncode(col("lat"), col("lon"), lit(6)))
          .withColumn("cell4", substring(col("gh"), 1, 4))
          .withColumn("dec_lat", GeoFunctions.geohashDecodeLat(col("gh")))
          .withColumn("dec_lon", GeoFunctions.geohashDecodeLon(col("gh")))
          .groupBy(col("cell4"))
          .agg(count(lit(1)).as("n_users"),
               round(max(abs(col("dec_lat") - col("lat"))), 6).as("max_lat_err"),
               round(max(abs(col("dec_lon") - col("lon"))), 6).as("max_lon_err"))
          .orderBy(col("cell4")),
      None),

    // Levenshtein distance over distinct part-name pairs.
    QueryDef(
      "string_levenshtein_pairs",
      (s, dir) => {
        val names = Tables(s, dir, "part").select(col("p_name").as("nm")).distinct()
        names.as("a").join(names.as("b"), col("a.nm") < col("b.nm"))
          .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"),
                  levenshtein(col("a.nm"), col("b.nm")).as("dist"))
          .filter(col("dist") <= 5)
          .orderBy(col("name_a"), col("name_b"))
      },
      Some("""
        WITH names AS (SELECT DISTINCT p_name AS nm FROM part)
        SELECT a.nm AS name_a, b.nm AS name_b, LEVENSHTEIN(a.nm, b.nm) AS dist
        FROM names a JOIN names b ON a.nm < b.nm
        WHERE LEVENSHTEIN(a.nm, b.nm) <= 5
        ORDER BY name_a, name_b""")),

    // Bitwise aggregates groupBitmapAnd/Or/Xor-style over integer keys.
    QueryDef(
      "agg_bit_ops",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(bit_and(col("l_orderkey")).as("and_key"),
               bit_or(col("l_orderkey")).as("or_key"),
               bit_xor(col("l_orderkey")).as("xor_key"),
               count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
          BIT_AND(l_orderkey) AS and_key,
          BIT_OR(l_orderkey) AS or_key,
          BIT_XOR(l_orderkey) AS xor_key,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // Quantified comparisons: > ALL / < ANY lowered to MAX/MIN scalar
    // subqueries (legal here: subqueries are non-empty and null-free).
    QueryDef(
      "subq_quantified",
      (s, dir) => {
        Seq("part", "orders").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM part
             WHERE p_retailprice > (SELECT MAX(o_totalprice / 1000.0) FROM orders))
              AS n_above_all,
            (SELECT COUNT(*) FROM part
             WHERE p_retailprice < (SELECT MAX(o_totalprice / 100.0) FROM orders))
              AS n_below_any""")
      },
      Some("""
        SELECT
          (SELECT COUNT(*) FROM part
           WHERE p_retailprice > ALL (SELECT o_totalprice / 1000.0 FROM orders))
            AS n_above_all,
          (SELECT COUNT(*) FROM part
           WHERE p_retailprice < ANY (SELECT o_totalprice / 100.0 FROM orders))
            AS n_below_any""")),

    // WITH TOTALS under HAVING, totals_mode = before_having: per-group
    // rows pass the HAVING filter, the TOTAL row aggregates every group.
    QueryDef(
      "agg_totals_having",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val groups = li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("sum_qty"))
          .filter(col("n") > lit(100L))
          .select(col("l_returnflag"), col("n"), col("sum_qty"))
        val totals = li.agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("sum_qty"))
          .select(lit("TOTAL").as("l_returnflag"), col("n"), col("sum_qty"))
        groups.unionByName(totals).orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, n, sum_qty FROM (
          SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 100
          UNION ALL
          SELECT 'TOTAL', COUNT(*),
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          FROM lineitem) t
        ORDER BY l_returnflag"""))
  )
}
