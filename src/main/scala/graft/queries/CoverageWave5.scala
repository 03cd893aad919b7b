package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-4 coverage wave: the -Array aggregate-combinator family
  * (reference /root/reference/src/AggregateFunctions/Combinators — any
  * aggregate applied element-wise across rows' arrays, registered via
  * AggregateFunctionCombinatorFactory.cpp) and multi-touch attribution
  * models (reference AggregateFunctionAttribution*.cpp: first-touch /
  * linear / position-based credit, extending the last-touch query in
  * Behavioral.scala).
  *
  * Attribution scale shape: every model is a single window pass over the
  * per-user event stream — one shuffle on user_id, no purchase×touch
  * join. The in-window touch summary (counts per channel + first/last
  * touch) comes from RANGE-framed conditional aggregates; the earliest /
  * latest touch's channel rides along by encoding (us, channel) into one
  * sortable long (us*2 + channel bit — µs timestamps keep us*2 far below
  * Long.Max), so no struct-ordering semantics are needed on either side.
  */
object CoverageWave5 {

  private val DayUs = 86400L * 1000000
  private val LookbackUs = 3 * DayUs

  /** (us, channel) → one sortable long; click sorts before view on ties. */
  private def touchCode = {
    when(col("event_type") === "click", col("us") * 2)
      .when(col("event_type") === "view", col("us") * 2 + 1)
  }

  private def chanOf(code: org.apache.spark.sql.Column) =
    when(pmod(code, lit(2)) === 0, lit("click")).otherwise(lit("view"))

  val defs: Seq[QueryDef] = Seq(

    // -Array combinators via the ClickHouse dialect: token-length arrays
    // per document, aggregated element-wise across the corpus. All five
    // lower to one ordinary hash aggregate over per-row array folds — no
    // explode, so the shuffle carries one row per document, not one per
    // token; map-side partial aggregation intact at any corpus size.
    QueryDef(
      "agg_array_combinators",
      (s, dir) => {
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql("""
          SELECT lang,
            countArray(la) AS n_tokens,
            sumArray(la) AS sum_len,
            minArray(la) AS min_len,
            maxArray(la) AS max_len,
            avgArray(la) AS avg_len
          FROM (SELECT lang, transform(splitByChar(' ', text), x -> length(x)) AS la
                FROM documents)
          GROUP BY lang
          ORDER BY lang""")
      },
      // Element sums are integer-valued doubles (token lengths), so the
      // double fold is exact and order-independent below 2^53.
      Some("""
        WITH t AS (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
        SELECT lang, COUNT(*) AS n_tokens,
          CAST(SUM(LENGTH(tok)) AS DOUBLE) AS sum_len,
          CAST(MIN(LENGTH(tok)) AS INTEGER) AS min_len,
          CAST(MAX(LENGTH(tok)) AS INTEGER) AS max_len,
          CAST(SUM(LENGTH(tok)) AS DOUBLE) / COUNT(*) AS avg_len
        FROM t
        GROUP BY lang
        ORDER BY lang""")),

    // -ForEach combinator: element-wise aggregation ACROSS rows of ragged
    // arrays (index i aggregates the rows whose array reaches i). One
    // shared single-pass buffer per group; shuffle carries one buffer per
    // group, not one row per element.
    QueryDef(
      "agg_foreach_combinators",
      (s, dir) => {
        import graft.aggregates.ForEachAgg
        val li = Tables(s, dir, "lineitem")
        val arr = when(col("l_linenumber") % 2 === 0,
            array(col("l_quantity"), col("l_extendedprice"),
                  col("l_discount"), col("l_tax")))
          .otherwise(array(col("l_quantity"), col("l_extendedprice"),
                  col("l_discount")))
        li.withColumn("arr", arr)
          .groupBy(col("l_returnflag"))
          .agg(ForEachAgg.sumForEach(col("arr")).as("sum_each"),
               ForEachAgg.minForEach(col("arr")).as("min_each"),
               ForEachAgg.maxForEach(col("arr")).as("max_each"),
               ForEachAgg.avgForEach(col("arr")).as("avg_each"),
               ForEachAgg.countForEach(col("arr")).as("count_each"))
          // The per-index arrays ARE the combinator's output; posexplode
          // them to scalar rows (agg_moving_array pattern) so the driver's
          // hash-compare, which can't sort array cells, checks every
          // element positionally.
          .select(col("l_returnflag"),
            posexplode(arrays_zip(col("sum_each"), col("min_each"),
              col("max_each"), col("avg_each"), col("count_each")))
              .as(Seq("idx", "z")))
          .select(col("l_returnflag"), col("idx"),
            col("z.sum_each").as("sum_e"), col("z.min_each").as("min_e"),
            col("z.max_each").as("max_e"), col("z.avg_each").as("avg_e"),
            col("z.count_each").as("count_e"))
          .orderBy(col("l_returnflag"), col("idx"))
      },
      // Elements compare bit-exact: sums ride the D6 micros convention on
      // both sides; min/max are raw column doubles.
      Some("""
        WITH t AS (
          SELECT l_returnflag,
            CASE WHEN l_linenumber % 2 = 0
                 THEN [l_quantity, l_extendedprice, l_discount, l_tax]
                 ELSE [l_quantity, l_extendedprice, l_discount] END AS arr
          FROM lineitem),
        e AS (SELECT l_returnflag, UNNEST(arr) AS x,
                     GENERATE_SUBSCRIPTS(arr, 1) AS i FROM t),
        a AS (SELECT l_returnflag, i,
            CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s,
            MIN(x) AS mn, MAX(x) AS mx,
            CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS av,
            COUNT(*) AS c
          FROM e GROUP BY l_returnflag, i)
        SELECT l_returnflag, CAST(i - 1 AS INTEGER) AS idx,
          s AS sum_e, mn AS min_e, mx AS max_e, av AS avg_e, c AS count_e
        FROM a
        ORDER BY l_returnflag, idx""")),

    // maxIntersections (reference AggregateFunctionMaxIntersections.h:
    // sort (position, ±1-weight) pairs — ends before starts on ties, so
    // intervals are [start, end) — and track the running-sum maximum).
    // Spark-native: union of +1/-1 points, one window per group, max of
    // the running sum. One shuffle on the group key; no interval pairing
    // join anywhere, so it scales as a sort within each group.
    QueryDef(
      "agg_max_intersections",
      (s, dir) => {
        // In-transit interval: [shipdate, shipdate + quantity days) — the
        // synthetic lineitem has no receiptdate, so transit time derives
        // deterministically from quantity.
        val li = Tables(s, dir, "lineitem").select(col("l_returnflag"),
          datediff(col("l_shipdate"), lit("1992-01-01")).as("sd"),
          (datediff(col("l_shipdate"), lit("1992-01-01")) +
            col("l_quantity").cast("int")).as("ed"))
        val pts = li.select(col("l_returnflag"), col("sd").as("pt"), lit(1).as("delta"))
          .unionAll(li.select(col("l_returnflag"), col("ed").as("pt"), lit(-1).as("delta")))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("pt"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("l_returnflag"))
        // maxIntersectionsPosition = first point reaching the maximum
        // (the reference records the position on each new maximum during
        // its ascending scan — i.e. the smallest such point).
        pts.withColumn("run", sum(col("delta")).over(w))
          .withColumn("mx", max(col("run")).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(max(col("run")).as("max_concurrent"),
               min(when(col("run") === col("mx"), col("pt"))).cast("long").as("max_position"),
               count(lit(1)).as("n_points"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH iv AS (
          SELECT l_returnflag,
            DATE_DIFF('day', DATE '1992-01-01', l_shipdate) AS sd,
            DATE_DIFF('day', DATE '1992-01-01', l_shipdate)
              + CAST(l_quantity AS INTEGER) AS ed
          FROM lineitem),
        pts AS (
          SELECT l_returnflag, sd AS pt, 1 AS delta FROM iv
          UNION ALL
          SELECT l_returnflag, ed AS pt, -1 AS delta FROM iv),
        r AS (
          SELECT l_returnflag, pt,
            SUM(delta) OVER (PARTITION BY l_returnflag ORDER BY pt, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM pts),
        r2 AS (
          SELECT l_returnflag, pt, run,
            MAX(run) OVER (PARTITION BY l_returnflag) AS mx
          FROM r)
        SELECT l_returnflag, CAST(MAX(run) AS BIGINT) AS max_concurrent,
          CAST(MIN(CASE WHEN run = mx THEN pt END) AS BIGINT) AS max_position,
          COUNT(*) AS n_points
        FROM r2
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // uniqUpTo(N): exact distinct count capped at N+1 (the reference uses
    // a bounded hash set per group; the Spark lowering keeps the exact
    // distinct plan — the cap is about the ANSWER contract, and Catalyst's
    // partial-distinct aggregation already bounds per-node state).
    QueryDef(
      "agg_uniq_up_to",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag,
            uniqUpTo(10, l_suppkey) AS cap10,
            uniqUpTo(100000, l_suppkey) AS uncapped
          FROM lineitem
          GROUP BY l_returnflag
          ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
          LEAST(COUNT(DISTINCT l_suppkey), 11) AS cap10,
          LEAST(COUNT(DISTINCT l_suppkey), 100001) AS uncapped
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // minMap / maxMap (Map-combinator family next to sumMap): per-user
    // map of event_type → min/max value, probed as scalar columns so the
    // harness hash-checks entries. Raw doubles — min/max need no
    // quantization.
    QueryDef(
      "map_minmax_values",
      (s, dir) => {
        val mn = graft.aggregates.MinMap()
        val mx = graft.aggregates.MaxMap()
        Tables(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(mn(col("event_type"), col("value")).as("mnm"),
               mx(col("event_type"), col("value")).as("mxm"))
          .select(col("user_id"),
                  size(map_keys(col("mnm"))).as("n_types"),
                  element_at(col("mnm"), "click").as("min_click"),
                  element_at(col("mxm"), "click").as("max_click"),
                  element_at(col("mnm"), "purchase").as("min_purchase"),
                  element_at(col("mxm"), "purchase").as("max_purchase"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
          CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types,
          MIN(CASE WHEN event_type = 'click' THEN value END) AS min_click,
          MAX(CASE WHEN event_type = 'click' THEN value END) AS max_click,
          MIN(CASE WHEN event_type = 'purchase' THEN value END) AS min_purchase,
          MAX(CASE WHEN event_type = 'purchase' THEN value END) AS max_purchase
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // groupArrayMovingAvg(3) (reference
    // AggregateFunctionGroupArrayMoving.cpp: the windowed variant divides
    // by the window SIZE, including the ramp-up elements): movingSum3/3,
    // posexploded like agg_moving_array so every element hash-checks.
    QueryDef(
      "agg_moving_avg_array",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(-2, 0)
        Tables(s, dir, "events")
          .select(col("user_id"), Tables.tsUs(col("ts")).as("us"), col("event_id"),
                  col("value"))
          .withColumn("m",
            (sum(col("value").cast(graft.Num.D6)).over(w).cast(DoubleType) / 3))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("m")))).as("s"))
          .select(col("user_id"), expr("transform(s, x -> x.m)").as("moving_avg3"))
          .select(col("user_id"), posexplode(col("moving_avg3")).as(Seq("idx", "moving_avg")))
          .orderBy(col("user_id"), col("idx"))
      },
      Some("""
        WITH b AS (SELECT user_id, EPOCH_US(ts) AS us, event_id, value FROM events),
        m AS (SELECT user_id, us, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                  PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 3 AS mv
              FROM b)
        SELECT user_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) - 1 AS INT) AS idx,
          mv AS moving_avg
        FROM m
        ORDER BY user_id, idx""")),

    // quantileExactLow / High: rank selection without interpolation
    // (reference QuantileExact.h:253 — low/high median at level 0.5,
    // trunc(level·n) otherwise). Distributed histogram, no value buffer.
    QueryDef(
      "agg_quantiles_lowhigh",
      (s, dir) => {
        import graft.operators.Quantiles
        val li = Tables(s, dir, "lineitem")
        val lo = Quantiles.percentilesExactRank(li, "l_linestatus", "l_quantity",
          Seq(0.5 -> "med_low", 0.1 -> "p10_low"), high = false)
        val hi = Quantiles.percentilesExactRank(li, "l_linestatus", "l_quantity",
          Seq(0.5 -> "med_high"), high = true)
        lo.join(hi, "l_linestatus")
          .select(col("l_linestatus"), col("med_low"), col("med_high"), col("p10_low"))
          .orderBy(col("l_linestatus"))
      },
      Some("""
        WITH s AS (
          SELECT l_linestatus,
            LIST(l_quantity ORDER BY l_quantity) AS a, COUNT(*) AS n
          FROM lineitem GROUP BY l_linestatus)
        SELECT l_linestatus,
          a[CAST(CASE WHEN n % 2 = 1 THEN n // 2 ELSE n // 2 - 1 END AS BIGINT) + 1]
            AS med_low,
          a[n // 2 + 1] AS med_high,
          a[LEAST(CAST(FLOOR(0.1 * n) AS BIGINT), n - 1) + 1] AS p10_low
        FROM s
        ORDER BY l_linestatus""")),

    // groupArraySorted(N): the N smallest values per group, sorted.
    QueryDef(
      "agg_group_array_sorted",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        // posexplode the top-N array so the driver gate hash-checks every
        // element (it can't sort array cells).
        s.sql("""
          SELECT o_orderstatus, idx, price
          FROM (SELECT o_orderstatus,
                  groupArraySorted(5, o_totalprice) AS low5
                FROM orders GROUP BY o_orderstatus)
          LATERAL VIEW posexplode(low5) t AS idx, price
          ORDER BY o_orderstatus, idx""")
      },
      Some("""
        WITH s AS (SELECT o_orderstatus,
            (LIST(o_totalprice ORDER BY o_totalprice))[1:5] AS low5
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus,
          CAST(GENERATE_SUBSCRIPTS(low5, 1) - 1 AS INTEGER) AS idx,
          UNNEST(low5) AS price
        FROM s
        ORDER BY o_orderstatus, idx""")),

    // topKWeighted: SpaceSaving heavy hitters by integer weight (floor of
    // the event value — floor, not cast, because DuckDB's double→BIGINT
    // cast rounds while Spark's truncates). Exact at test capacity.
    QueryDef(
      "topk_weighted_value",
      (s, dir) => {
        val topkw = graft.aggregates.TopKWeighted(10)
        Tables(s, dir, "events")
          .agg(topkw(col("user_id"), floor(col("value")).cast("long")).as("tu"))
          .select(posexplode(col("tu")).as(Seq("pos", "user_id")))
          .select((col("pos") + 1).as("rank"), col("user_id"))
          .orderBy(col("rank"))
      },
      Some("""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY w DESC, user_id) AS INTEGER) AS rank,
          user_id
        FROM (SELECT user_id, SUM(CAST(FLOOR(value) AS BIGINT)) AS w
              FROM events GROUP BY user_id) t
        ORDER BY w DESC, user_id
        LIMIT 10""")),

    // First-touch model: each purchase credits the EARLIEST click/view
    // inside the 3-day lookback (last-touch's mirror; reference
    // AggregateFunctionAttribution first-touch mode).
    QueryDef(
      "attribution_first_touch",
      (s, dir) => {
        val w3 = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-LookbackUs, -1)
        Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .withColumn("first_code", min(touchCode).over(w3))
          .filter(col("event_type") === "purchase")
          .withColumn("channel",
            when(col("first_code").isNull, lit("direct"))
              .otherwise(chanOf(col("first_code"))))
          .withColumn("gap_us",
            when(col("first_code").isNotNull,
              col("us") - expr("first_code div 2")))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
               (sum(col("gap_us")).cast(DoubleType) /
                 nullif(count(col("gap_us")), lit(0L))).as("avg_gap_us"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH t AS (
          SELECT user_id, event_type, EPOCH_US(ts) AS us,
            MIN(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) * 2
                     WHEN event_type = 'view' THEN EPOCH_US(ts) * 2 + 1 END)
              OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                    RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING) AS first_code
          FROM events),
        p AS (
          SELECT CASE WHEN first_code IS NULL THEN 'direct'
                      WHEN first_code % 2 = 0 THEN 'click' ELSE 'view' END AS channel,
                 us - first_code // 2 AS gap_us
          FROM t WHERE event_type = 'purchase')
        SELECT channel, COUNT(*) AS n_purchases,
          CAST(SUM(gap_us) AS DOUBLE) / NULLIF(COUNT(gap_us), 0) AS avg_gap_us
        FROM p
        GROUP BY channel
        ORDER BY channel""")),

    // Linear + position-based (U-shaped) models: every touch in the
    // lookback shares the purchase's credit — equally (linear), or
    // 40/20/40 with the first and last touch boosted (position; the
    // k=1 → 1.0 and k=2 → 0.5/0.5 degenerate cases follow the usual
    // convention). Per-purchase credits quantize to DECIMAL(18,6) before
    // summing (Num convention) so the totals are order-independent.
    QueryDef(
      "attribution_linear_position",
      (s, dir) => {
        val w3 = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-LookbackUs, -1)
        // All four frame aggregates in one select → a single Window node
        // (one pass over each user's sorted stream), not four.
        val base = Tables(s, dir, "events")
          .withColumn("us", Tables.tsUs(col("ts")))
          .select(col("user_id"), col("event_type"), col("us"),
            count(when(col("event_type") === "click", 1)).over(w3).as("n_click"),
            count(when(col("event_type") === "view", 1)).over(w3).as("n_view"),
            min(touchCode).over(w3).as("first_code"),
            max(touchCode).over(w3).as("last_code"))
          .filter(col("event_type") === "purchase")
          .withColumn("k", (col("n_click") + col("n_view")).cast(LongType))
        val firstClick = when(pmod(col("first_code"), lit(2)) === 0, 1d).otherwise(0d)
        val lastClick = when(pmod(col("last_code"), lit(2)) === 0, 1d).otherwise(0d)
        val midClick = col("n_click") - firstClick - lastClick
        val uClick =
          when(col("k") === 1, firstClick)
            .when(col("k") === 2, lit(0.5) * firstClick + lit(0.5) * lastClick)
            .otherwise(lit(0.4) * firstClick + lit(0.4) * lastClick +
              lit(0.2) * midClick / (col("k") - 2))
        val d6 = graft.Num.D6
        base
          .withColumn("lin_click",
            when(col("k") > 0, col("n_click").cast(DoubleType) / col("k")).otherwise(0d))
          .withColumn("u_click", when(col("k") > 0, uClick).otherwise(0d))
          .agg(count(lit(1)).as("n_purchases"),
               count(when(col("k") === 0, 1)).as("n_direct"),
               sum(col("lin_click").cast(d6)).cast(DoubleType).as("lin_click_credit"),
               sum((when(col("k") > 0, lit(1d)).otherwise(0d) - col("lin_click")).cast(d6))
                 .cast(DoubleType).as("lin_view_credit"),
               sum(col("u_click").cast(d6)).cast(DoubleType).as("u_click_credit"),
               sum((when(col("k") > 0, lit(1d)).otherwise(0d) - col("u_click")).cast(d6))
                 .cast(DoubleType).as("u_view_credit"))
      },
      Some("""
        WITH t AS (
          SELECT user_id, event_type, EPOCH_US(ts) AS us,
            COUNT(CASE WHEN event_type = 'click' THEN 1 END)
              OVER w3 AS n_click,
            COUNT(CASE WHEN event_type = 'view' THEN 1 END)
              OVER w3 AS n_view,
            MIN(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) * 2
                     WHEN event_type = 'view' THEN EPOCH_US(ts) * 2 + 1 END)
              OVER w3 AS first_code,
            MAX(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) * 2
                     WHEN event_type = 'view' THEN EPOCH_US(ts) * 2 + 1 END)
              OVER w3 AS last_code
          FROM events
          WINDOW w3 AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                        RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING)),
        p AS (
          SELECT n_click + n_view AS k, n_click,
            CASE WHEN first_code % 2 = 0 THEN 1.0 ELSE 0.0 END AS fc,
            CASE WHEN last_code % 2 = 0 THEN 1.0 ELSE 0.0 END AS lc
          FROM t WHERE event_type = 'purchase'),
        c AS (
          SELECT k,
            CASE WHEN k > 0 THEN CAST(n_click AS DOUBLE) / k ELSE 0 END AS lin_click,
            CASE WHEN k = 0 THEN 0
                 WHEN k = 1 THEN fc
                 WHEN k = 2 THEN 0.5 * fc + 0.5 * lc
                 ELSE 0.4 * fc + 0.4 * lc + 0.2 * (n_click - fc - lc) / (k - 2)
            END AS u_click
          FROM p)
        SELECT COUNT(*) AS n_purchases,
          COUNT(CASE WHEN k = 0 THEN 1 END) AS n_direct,
          CAST(SUM(CAST(lin_click AS DECIMAL(18,6))) AS DOUBLE) AS lin_click_credit,
          CAST(SUM(CAST(CASE WHEN k > 0 THEN 1.0 ELSE 0.0 END - lin_click
            AS DECIMAL(18,6))) AS DOUBLE) AS lin_view_credit,
          CAST(SUM(CAST(u_click AS DECIMAL(18,6))) AS DOUBLE) AS u_click_credit,
          CAST(SUM(CAST(CASE WHEN k > 0 THEN 1.0 ELSE 0.0 END - u_click
            AS DECIMAL(18,6))) AS DOUBLE) AS u_view_credit
        FROM c"""))
  )
}
