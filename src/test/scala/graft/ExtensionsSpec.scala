package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("float_dot_product injects via spark.sql.extensions") {
    // Force a genuinely new session: getOrCreate would reuse the shared
    // one and skip extension application.
    val prev = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions ≡ spark.sql.extensions=graft.GraftExtensions for a
    // fresh cluster; the config form is only read at SparkContext creation,
    // which this shared-JVM test can't redo.
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("v")
      val r = s2.sql("SELECT float_dot_product(a, b) AS d FROM v").collect()(0)
      assert(r.getDouble(0) === 11.0)
    } finally {
      // do NOT s2.stop(): sessions share the JVM's single SparkContext;
      // stopping it would kill every other suite's session
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
