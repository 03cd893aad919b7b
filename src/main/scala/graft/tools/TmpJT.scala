package graft.tools
import org.apache.spark.sql.SparkSession
object TmpJT {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.sql.ChCoercions.IeeeDivFlag, "true")
      .config(graft.sql.ChCoercions.SetOpsAllFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.registerFunctions(spark)
    graft.sql.ClickHouseAliases.injectStrict(spark)
    val session = new graft.sql.ChSession(spark)
    Seq(
      "CREATE TABLE decimal (a Decimal(9,0), b Decimal(18,0)) ENGINE = CnchMergeTree ORDER BY a",
      "INSERT INTO decimal (a, b) VALUES (0, 0)",
      "INSERT INTO decimal (a, b) VALUES (42, 42)"
    ).foreach(s => session.execute(graft.sql.ChSession.stripDbRefs(s)))
    val q = "SELECT a / a, intDiv(a, a), intDivOrZero(a, a) FROM decimal WHERE a = 42"
    try {
      val df = spark.sql(graft.sql.ChTranspiler.transpile(q))
      df.explain(false)
      println(df.collect().mkString(" | "))
    } catch { case e: Throwable =>
      println("ERR " + e.getMessage.take(200))
      e.getStackTrace.take(12).foreach(t => println("  " + t))
    }
    spark.stop()
  }
}
