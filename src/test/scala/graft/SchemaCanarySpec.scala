package graft

import org.apache.spark.sql.types._

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds, and the physical parquet encoding of timestamp columns has
  * already drifted twice (TIMESTAMP(NANOS) → tz-less timestamp[us]/NTZ).
  * [[Tables.apply]] is the single choke point that normalizes every
  * encoding to the engine's canonical logical schema; this spec pins that
  * contract for every table × every sf directory, so the NEXT silent
  * regeneration fails one named test here instead of 40 queries at the
  * driver's correctness gate (the round-7 failure mode).
  *
  * Canonical contract: timestamp columns surface as `TimestampType`
  * (never NTZ, never raw long nanos), and the column inventory each
  * query family depends on is present with a sane type.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).exists())

  test("at least one sf directory exists to canary against") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  test("no table surfaces TIMESTAMP_NTZ or raw-long timestamp columns") {
    for (dir <- sfDirs; t <- Tables.all) {
      val schema = Tables(spark, dir, t).schema
      val ntz = schema.fields.filter(_.dataType == TimestampNTZType)
      assert(ntz.isEmpty,
        s"$dir/$t: NTZ columns ${ntz.map(_.name).mkString(",")} escaped Tables.apply")
      if (t == "events")
        assert(schema("ts").dataType == TimestampType,
          s"$dir/events.ts is ${schema("ts").dataType}, want TimestampType")
    }
  }

  test("canonical logical schema per table (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).exists())
    // (table, column, expected type) for every column a query family's
    // strictly-typed call sites depend on.
    val contract: Seq[(String, String, DataType)] = Seq(
      ("events", "ts", TimestampType),
      ("events", "user_id", LongType),
      ("events", "event_type", StringType),
      ("events", "value", DoubleType),
      ("lineitem", "l_shipdate", TimestampType),
      ("lineitem", "l_quantity", DoubleType),
      ("lineitem", "l_extendedprice", DoubleType),
      ("lineitem", "l_orderkey", LongType),
      ("orders", "o_orderdate", TimestampType),
      ("orders", "o_custkey", LongType),
      ("customer", "c_custkey", LongType),
      ("documents", "doc_id", LongType),
      ("documents", "text", StringType),
      ("embeddings", "vec_id", LongType))
    for ((t, c, dt) <- contract) {
      val schema = Tables(spark, dir, t).schema
      assert(schema.fieldNames.contains(c), s"$t lacks column $c")
      assert(schema(c).dataType == dt,
        s"$t.$c is ${schema(c).dataType}, want $dt")
    }
    // embeddings vector column: array of a floating type.
    val emb = Tables(spark, dir, "embeddings").schema
    val vecField = emb.fields.find(_.dataType.isInstanceOf[ArrayType])
    assert(vecField.isDefined, "embeddings lacks an array-typed vector column")
  }
}
