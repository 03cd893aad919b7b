package graft

/** The reference's NdvBuckets / statistics infrastructure
  * (/root/reference/src/Statistics/ — per-column NDV sketches feeding
  * the cost-based optimizer) maps onto Spark's own ANALYZE TABLE +
  * CBO: this spec pins that the Spark-native path actually delivers the
  * same capability — row counts and per-column distinct counts stored in
  * the catalog, and ndv-driven selectivity estimation shrinking
  * cardinality estimates through filters — so the component is closed by
  * the platform rather than re-implemented.
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE FOR COLUMNS supplies rowCount/ndv and drives selectivity") {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      Tables(spark, "/root/testdata/sf0.001", "nation")
        .write.mode("overwrite").saveAsTable("cbo_nation")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")

      val stats = spark.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"rowCount: ${stats.rowCount}")
      val ndv = stats.attributeStats.collectFirst {
        case (a, cs) if a.name == "n_nationkey" => cs.distinctCount
      }.flatten
      assert(ndv.contains(BigInt(25)), s"n_nationkey ndv: $ndv")

      // ndv-driven selectivity: an equality filter on the 25-distinct key
      // estimates ~1 row, not 25
      val est = spark.table("cbo_nation").filter("n_nationkey = 3")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(_ <= BigInt(2)), s"filtered estimate: $est")

      // a 5-distinct column estimates 1/5 of the rows
      val est5 = spark.table("cbo_nation").filter("n_regionkey = 0")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est5.exists(r => r >= BigInt(3) && r <= BigInt(7)),
        s"region filter estimate: $est5")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
    }
  }
}
