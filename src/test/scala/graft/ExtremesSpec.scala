package graft

import graft.tools.Extremes
import org.apache.spark.sql.functions._

/** Extremes decoration: two min/max rows appended to any result, numeric
  * columns only (the reference's extremes=1 block).
  */
class ExtremesSpec extends SparkSpec {
  import spark.implicits._

  test("appends per-numeric-column min and max rows") {
    val df = Seq(("a", 3, 2.5), ("b", 1, 7.25), ("c", 2, -1.0))
      .toDF("k", "n", "v")
    val out = Extremes.withExtremes(df)
    assert(out.count() === 5)
    val byKind = out.collect().groupBy(_.getAs[String]("__row_kind"))
    assert(byKind("result").length === 3)
    val mn = byKind("min")(0)
    val mx = byKind("max")(0)
    assert(mn.getAs[Any]("k") === null) // non-numeric: null in extremes
    assert(mn.getAs[Int]("n") === 1 && mn.getAs[Double]("v") === -1.0)
    assert(mx.getAs[Int]("n") === 3 && mx.getAs[Double]("v") === 7.25)
  }

  test("works on an aggregated result frame") {
    val agg = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("g", "x")
      .groupBy("g").agg(sum(col("x")).as("s"))
    val out = Extremes.withExtremes(agg)
    val mx = out.filter(col("__row_kind") === "max").collect()(0)
    assert(mx.getAs[Double]("s") === 30.0)
  }
}
