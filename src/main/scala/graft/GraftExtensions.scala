package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FloatDotProduct

/** SparkSessionExtensions injection point: makes the engine's native
  * expressions available to any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the deployment
  * path where the engine is a library on a shared cluster and sessions
  * are not built through [[Engine.session]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot_product"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot_product"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1))))
  }
}
