package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public entry point of the library: a tuned SparkSession factory, the
  * TESTDATA catalog, and a SQL front door with the engine's custom
  * aggregates registered for SQL use — the Spark-native analogue of the
  * reference's session + function-factory bootstrap
  * (/root/reference/src/Functions/registerFunctions.cpp:31,
  * /root/reference/src/AggregateFunctions/AggregateFunctionFactory.h:52).
  */
object Engine {

  /** Build a session with the scale-relevant optimizer features on: AQE
    * (runtime re-planning + skew handling), CBO, runtime bloom filters,
    * parquet aggregate pushdown. `shufflePartitions` should track the
    * cluster's effective parallelism (matches cores in local mode).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Tz-less parquet timestamps (one observed testdata regeneration)
      // must surface as TimestampType, not NTZ — see Tables.apply.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerFunctions(spark)
    spark
  }

  /** Register the custom aggregate library for SQL texts. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.udf.register("window_funnel_7d_3",
      aggregates.WindowFunnel(7L * 86400 * 1000000, 3))
    spark.udf.register("retention3", aggregates.Retention())
    spark.udf.register("top_k_10", aggregates.TopK(10))
    spark.udf.register("top_k_weighted_10", aggregates.TopKWeighted(10))
    spark.udf.register("minMap", aggregates.MinMap())
    spark.udf.register("maxMap", aggregates.MaxMap())
    spark.udf.register("sumForEach", aggregates.ForEachAgg.sumForEach)
    spark.udf.register("avgForEach", aggregates.ForEachAgg.avgForEach)
    spark.udf.register("minForEach", aggregates.ForEachAgg.minForEach)
    spark.udf.register("maxForEach", aggregates.ForEachAgg.maxForEach)
    spark.udf.register("countForEach", aggregates.ForEachAgg.countForEach)
    spark.udf.register("group_bitmap", aggregates.BitmapAggregates.groupBitmap)
    spark.udf.register("bitmap_cardinality", aggregates.BitmapAggregates.bitmapCardinality)
    spark.udf.register("bitmap_and_cardinality", aggregates.BitmapAggregates.bitmapAndCardinality)
    spark.udf.register("bitmap_or_cardinality", aggregates.BitmapAggregates.bitmapOrCardinality)
    // bitmapFromColumn (AggregateFunctionBitmapFromColumn.cpp) is the
    // reference's name for the int-column → BitMap64 build; same
    // aggregate as group_bitmap.
    spark.udf.register("bitmapFromColumn", aggregates.BitmapAggregates.groupBitmap)
    // camelCase spellings (reference FunctionsBitmap.h registrations) —
    // the corpus tests use these names directly
    spark.udf.register("bitmapCardinality",
      aggregates.BitmapAggregates.bitmapCardinality)
    spark.udf.register("bitmapAndCardinality",
      aggregates.BitmapAggregates.bitmapAndCardinality)
    spark.udf.register("bitmapOrCardinality",
      aggregates.BitmapAggregates.bitmapOrCardinality)
    spark.udf.register("bitmapAndnotCardinality",
      aggregates.BitmapAggregates.bitmapAndnotCardinality)
    spark.udf.register("bitmapColumnOr", aggregates.BitmapAggregates.bitmapColumnOr)
    spark.udf.register("bitmapColumnAnd", aggregates.BitmapAggregates.bitmapColumnAnd)
    spark.udf.register("bitmapColumnXor", aggregates.BitmapAggregates.bitmapColumnXor)
    spark.udf.register("bitmapColumnCardinality",
      aggregates.BitmapAggregates.bitmapColumnCardinality)
    spark.udf.register("bitmapColumnHas", aggregates.BitmapAggregates.bitmapColumnHas)
    // bitmap value algebra (FunctionsBitmap.h scalar surface)
    spark.udf.register("bitmapContains", aggregates.BitmapAggregates.bitmapContains)
    spark.udf.register("bitmapHasAll", aggregates.BitmapAggregates.bitmapHasAll)
    spark.udf.register("bitmapHasAny", aggregates.BitmapAggregates.bitmapHasAny)
    spark.udf.register("subBitmap", aggregates.BitmapAggregates.subBitmap)
    spark.udf.register("bitmapMin", aggregates.BitmapAggregates.bitmapMin)
    spark.udf.register("bitmapMax", aggregates.BitmapAggregates.bitmapMax)
    spark.udf.register("bitmapSubsetInRange",
      aggregates.BitmapAggregates.bitmapSubsetInRange)
    spark.udf.register("bitmapSubsetLimit",
      aggregates.BitmapAggregates.bitmapSubsetLimit)
    spark.udf.register("bitmapTransform", aggregates.BitmapAggregates.bitmapTransform)
    spark.udf.register("bitmapAnd", aggregates.BitmapAggregates.bitmapAnd)
    spark.udf.register("bitmapOr", aggregates.BitmapAggregates.bitmapOr)
    spark.udf.register("bitmapXor", aggregates.BitmapAggregates.bitmapXor)
    spark.udf.register("bitmapAndnot", aggregates.BitmapAggregates.bitmapAndnot)
    spark.udf.register("bitmapXorCardinality",
      aggregates.BitmapAggregates.bitmapXorCardinality)
    spark.udf.register("bitmapBuild", aggregates.BitmapAggregates.bitmapBuild)
    spark.udf.register("bitmapToArray", aggregates.BitmapAggregates.bitmapToArray)
    // scalar array → bitmap bytes: BitMap64 column INSERT path (the
    // reference's BitMap64 accepts Array literals on ingest)
    spark.udf.register("arrayToBitmap", (xs: Seq[Long]) => {
      val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
      if (xs != null) xs.foreach(bm.addLong)
      aggregates.BitmapAggregates.serialize(bm)
    })
    // geohash SQL spellings (reference GeoHash.cpp argument order is
    // longitude FIRST; decode returns the (lon, lat) tuple — field
    // names col1/col2 so CH `.1`/`.2` access resolves)
    spark.udf.register("geohashEncode",
      (lon: Double, lat: Double, p: Int) =>
        // reference GeoHash.cpp geohashPrecision clamps BOTH directions:
        // out-of-range precision (≤0 or >12) falls back to 12
        functions.GeoFunctions.encode(lat, lon, if (p <= 0 || p > 12) 12 else p))
    spark.udf.register("geohashDecode", (h: String) => {
      val (lat, lon) = functions.GeoFunctions.decode(h)
      GeoPoint(lon, lat)
    })
    spark.udf.register("geohashesInBox", functions.GeoFunctions.geohashesInBox _)
    // H3 hex-grid index family (public H3 index spec bit math —
    // functions/H3Functions.scala; corpus 01070_h3_*)
    spark.udf.register("h3GetResolution",
      (h: Long) => functions.H3Functions.resolution(h))
    spark.udf.register("h3GetBaseCell",
      (h: Long) => functions.H3Functions.baseCell(h))
    spark.udf.register("h3ToParent", functions.H3Functions.toParent _)
    spark.udf.register("h3ToChildren", functions.H3Functions.toChildren _)
    spark.udf.register("h3HexAreaM2", functions.H3Functions.hexAreaM2 _)
    spark.udf.register("h3IndexesAreNeighbors",
      functions.H3Functions.indexesAreNeighbors _)
    spark.udf.register("h3ToString", functions.H3Functions.toHexString _)
    spark.udf.register("stringToH3", functions.H3Functions.fromHexString _)
    spark.udf.register("h3EdgeLengthM", functions.H3Functions.edgeLengthM _)
    spark.udf.register("h3EdgeAngle", functions.H3Functions.edgeAngle _)
    spark.udf.register("h3IsValid", functions.H3Functions.isValid _)
    spark.udf.register("h3kRing",
      (h: Long, k: Int) => functions.H3Functions.kRing(h, k))
    // uniqTheta set-op scalars (FunctionsUniqTheta.h)
    spark.udf.register("uniqThetaUnion", aggregates.SketchAggregates.uniqThetaUnion)
    spark.udf.register("uniqThetaIntersect",
      aggregates.SketchAggregates.uniqThetaIntersect)
    spark.udf.register("uniqThetaNot", aggregates.SketchAggregates.uniqThetaNot)
    spark.udf.register("thetaSketchToEstimate",
      aggregates.SketchAggregates.thetaEstimate)
  }

  /** SQL front door over an sf directory: registers the catalog and runs
    * the text through Spark SQL (custom functions available).
    */
  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(text)
  }
}

/** geohashDecode's (longitude, latitude) tuple — field names match the
  * CH positional access convention (`.1` → col1).
  */
case class GeoPoint(col1: Double, col2: Double)
