package graft

import graft.tools.Explain

class ExplainSpec extends SparkSpec {
  import spark.implicits._

  test("explain modes map to distinct query-execution stages") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v").filter($"k" > 0).groupBy($"v").count()
    val ast = Explain.explain(df, Explain.Ast)
    val syntax = Explain.explain(df, Explain.Syntax)
    val plan = Explain.explain(df, Explain.Plan)
    val pipeline = Explain.explain(df, Explain.Pipeline)
    val analyze = Explain.explain(df, Explain.Analyze)
    Seq(ast, syntax, plan, pipeline, analyze).foreach(s => assert(s.nonEmpty))
    assert(ast.contains("Aggregate") || ast.contains("count"))
    assert(pipeline.contains("HashAggregate"), pipeline)
    assert(analyze.contains("Physical Plan"), analyze.take(300))
  }
}
