package graft.queries

import graft.{QueryDef, Tables}
import graft.aggregates.BitmapAggregates
import org.apache.spark.sql.functions._

/** Second funnel/bitmap wave: the reference's join-form bitmap aggregate,
  * group-split funnels, and per-layer conversion-interval statistics.
  */
object FunnelFamily2 {

  private val DayUs = 86400L * 1000000
  private val WatchStartUs = 1704067200000000L
  private val WatchDays = 30

  val defs: Seq[QueryDef] = Seq(

    // bitMapJoinAndCard (reference AggregateFunctionBitMapJoin.cpp:92 —
    // an in-aggregate hash join of two (join_key, attrs, bitmap) streams
    // with AND/OR combination, thread-pooled because ClickHouse lacks a
    // distributed join). Spark-first this IS the native join: per-key
    // bitmaps from two distributed hash aggregates, equi-joined by the
    // planner (broadcast here — both sides are #days-sized), AND
    // cardinality as a scalar. No custom operator needed — the point of
    // re-architecting on Spark.
    QueryDef(
      "bitmap_join_and_card",
      (s, dir) => {
        val ud = Tables(s, dir, "events")
          .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .as("day"), col("event_type"), col("user_id"))
        val a = ud.filter(col("event_type").isin("click", "view"))
          .groupBy(col("day"), col("event_type").as("channel"))
          .agg(BitmapAggregates.groupBitmap(col("user_id")).as("bma"))
        val b = ud.filter(col("event_type") === "purchase")
          .groupBy(col("day"))
          .agg(BitmapAggregates.groupBitmap(col("user_id")).as("bmb"))
        a.join(b, Seq("day"))
          .select(col("day"), col("channel"),
            BitmapAggregates.bitmapAndCardinality(col("bma"), col("bmb"))
              .as("overlap"))
          .orderBy(col("day"), col("channel"))
      },
      Some("""
        WITH ud AS (SELECT DISTINCT
            CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
              AS day,
            event_type, user_id
          FROM events),
        a AS (SELECT day, event_type AS channel, user_id FROM ud
              WHERE event_type IN ('click', 'view')),
        b AS (SELECT day, user_id FROM ud WHERE event_type = 'purchase')
        SELECT a.day, a.channel,
          CAST(COUNT(CASE WHEN b.user_id IS NOT NULL THEN 1 END) AS BIGINT)
            AS overlap
        FROM a
          JOIN (SELECT DISTINCT day FROM b) bd ON bd.day = a.day
          LEFT JOIN b ON b.day = a.day AND b.user_id = a.user_id
        GROUP BY a.day, a.channel ORDER BY a.day, a.channel""")),

    // finderGroupFunnel (reference AggregateFunctionFinderGroupFunnel.h:52
    // — funnel levels split by an event-property group, state multiplied
    // per group). Spark-first the group is just another grouping column:
    // chain-start (signup) events keep their own property bucket, chain
    // continuation events are replicated to every bucket (same information
    // flow as the reference's shared event buffer), and the existing
    // finderFunnel aggregate runs per (user, group).
    QueryDef(
      "finder_group_funnel",
      (s, dir) => {
        val ff = graft.aggregates.FinderFunnelAgg
          .finderFunnel(WatchStartUs, DayUs, WatchDays, DayUs, 3) _
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
          .agg(ff(Tables.tsUs(col("ts")), col("step")).as("levels"))
          .select(col("grp"), posexplode(col("levels")).as(Seq("slot", "lvl")))
          .filter(col("lvl") > 0)
          .groupBy(col("slot"), col("grp"))
          .agg(count(lit(1)).as("reached_1"),
            count(when(col("lvl") >= 2, 1)).as("reached_2"),
            count(when(col("lvl") >= 3, 1)).as("reached_3"))
          .orderBy(col("slot"), col("grp"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                   FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type, k,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type, k,
                MIN(CASE WHEN event_type = 'click' THEN us END) OVER w AS c_next,
                MIN(CASE WHEN event_type = 'click' THEN p_next END) OVER w AS cp_next
              FROM x
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        lv AS (SELECT user_id,
                 CASE WHEN k < 33 THEN 'low' WHEN k < 67 THEN 'mid'
                      ELSE 'high' END AS grp,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cp_next IS NOT NULL AND cp_next - us <= 86400000000 THEN 3
                      WHEN c_next IS NOT NULL AND c_next - us <= 86400000000 THEN 2
                      ELSE 1 END AS lvl
               FROM y WHERE event_type = 'signup'),
        m AS (SELECT user_id, slot, grp, MAX(lvl) AS lvl FROM lv
              WHERE slot >= 0 AND slot < 30 GROUP BY 1, 2, 3)
        SELECT slot, grp, COUNT(*) AS reached_1,
          COUNT(CASE WHEN lvl >= 2 THEN 1 END) AS reached_2,
          COUNT(CASE WHEN lvl >= 3 THEN 1 END) AS reached_3
        FROM m GROUP BY slot, grp ORDER BY slot, grp""")),

    // funnelRep2/funnelRep3 (reference AggregateFunctionFunnelRep2.h:81 —
    // count/sum/min/max arithmetic of the step→step+1 conversion interval
    // per funnel layer). Unit = the first signup per (user, day-slot);
    // chain = greedy earliest completion (first click at-or-after the
    // anchor, first purchase at-or-after that click, all within the 1-day
    // window) — two conditional-min window sweeps, no self-join.
    QueryDef(
      "funnel_interval_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir, "events")
          .filter(col("event_type").isin("signup", "click", "purchase"))
          .select(col("user_id"), Tables.tsUs(col("ts")).as("us"),
            col("event_type"))
        val fwd = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(0, Window.unboundedFollowing)
        val x = e.withColumn("p_next",
          min(when(col("event_type") === "purchase", col("us"))).over(fwd))
        val y = x.withColumn("cfirst",
          min(when(col("event_type") === "click",
            struct(col("us").as("c_us"), col("p_next").as("c_pn")))).over(fwd))
        val units = y.filter(col("event_type") === "signup")
          .withColumn("slot",
            ((col("us") - WatchStartUs) / DayUs).cast("int"))
          .filter(col("slot").between(0, WatchDays - 1))
          .withColumn("t2", when(col("cfirst.c_us") <= col("us") + DayUs,
            col("cfirst.c_us")))
          .withColumn("t3", when(col("cfirst.c_us") <= col("us") + DayUs &&
            col("cfirst.c_pn") <= col("us") + DayUs, col("cfirst.c_pn")))
          .groupBy(col("user_id"), col("slot"))
          .agg(min(struct(col("us"), col("t2"), col("t3"))).as("u"))
          .select(col("u.us").as("t1"), col("u.t2"), col("u.t3"))
        units.select(explode(array(
            struct(lit("1_to_2").as("layer"), (col("t2") - col("t1")).as("gap")),
            struct(lit("2_to_3").as("layer"), (col("t3") - col("t2")).as("gap"))))
            .as("lg"))
          .select(col("lg.layer").as("layer"), col("lg.gap").as("gap"))
          .filter(col("gap").isNotNull)
          .groupBy(col("layer"))
          .agg(count(lit(1)).as("n"),
            (sum(col("gap")).cast("double") / count(lit(1))).as("avg_us"),
            min(col("gap")).as("min_us"), max(col("gap")).as("max_us"))
          .orderBy(col("layer"))
      },
      Some("""
        WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
                   WHERE event_type IN ('signup', 'click', 'purchase')),
        x AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_next
              FROM e),
        y AS (SELECT user_id, us, event_type,
                MIN(CASE WHEN event_type = 'click'
                  THEN struct_pack(c_us := us, c_pn := p_next) END) OVER
                  (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS cfirst
              FROM x),
        su AS (SELECT user_id, us,
                 CAST((us - 1704067200000000) // 86400000000 AS INTEGER) AS slot,
                 CASE WHEN cfirst.c_us <= us + 86400000000
                      THEN cfirst.c_us END AS t2,
                 CASE WHEN cfirst.c_us <= us + 86400000000
                       AND cfirst.c_pn <= us + 86400000000
                      THEN cfirst.c_pn END AS t3
               FROM y WHERE event_type = 'signup'),
        units AS (SELECT MIN(struct_pack(t1 := us, t2 := t2, t3 := t3)) AS u
                  FROM su WHERE slot >= 0 AND slot < 30
                  GROUP BY user_id, slot),
        gaps AS (SELECT '1_to_2' AS layer, u.t2 - u.t1 AS gap FROM units
                 UNION ALL
                 SELECT '2_to_3', u.t3 - u.t2 FROM units)
        SELECT layer, COUNT(*) AS n,
          CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_us,
          MIN(gap) AS min_us, MAX(gap) AS max_us
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY layer ORDER BY layer"""))
  )
}
