package graft.tools

import org.apache.spark.sql.DataFrame

/** EXPLAIN-mode mapping (reference ASTExplainQuery modes
  * AST/SYNTAX/PLAN/PIPELINE/ANALYZE,
  * /root/reference/src/Parsers/ASTExplainQuery.h:38-53) onto Spark's
  * query-execution stages — the engine's plan printer.
  */
object Explain {

  sealed trait Mode
  case object Ast extends Mode       // parsed logical plan
  case object Syntax extends Mode    // analyzed (resolved) plan
  case object Plan extends Mode      // optimized logical plan
  case object Pipeline extends Mode  // physical SparkPlan
  case object Analyze extends Mode   // executed plan with codegen ids

  def explain(df: DataFrame, mode: Mode): String = {
    val qe = df.queryExecution
    mode match {
      case Ast      => qe.logical.treeString
      case Syntax   => qe.analyzed.treeString
      case Plan     => qe.optimizedPlan.treeString
      case Pipeline => qe.sparkPlan.treeString
      case Analyze  => qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
  }
}
