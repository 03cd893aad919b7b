package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatDotProduct, HyperplaneLshBucket}
import graft.plans.{AsofJoinRewrite, AsofLE}

/** SparkSessionExtensions injection point: makes the engine's native
  * expressions and logical rewrite rules available to any session started
  * with `--conf spark.sql.extensions=graft.GraftExtensions` — the
  * deployment path where the engine is a library on a shared cluster and
  * sessions are not built through [[Engine.session]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot_product"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot_product"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_lsh_bucket"),
      new ExpressionInfo(classOf[HyperplaneLshBucket].getName, "hyperplane_lsh_bucket"),
      (children: Seq[Expression]) => children match {
        case Seq(v, p) => HyperplaneLshBucket(v,
          p.eval().asInstanceOf[Number].intValue())
      }))
    // ASOF join surface: JOIN ... ON l.k = r.k AND asof_le(r.ts, l.ts);
    // the marker is unevaluable and MUST be consumed by AsofJoinRewrite.
    ext.injectFunction((
      FunctionIdentifier("asof_le"),
      new ExpressionInfo(classOf[AsofLE].getName, "asof_le"),
      (children: Seq[Expression]) => AsofLE(children(0), children(1))))
    ext.injectOptimizerRule(_ => AsofJoinRewrite)
    // Transparent MV rewrite: aggregates over a base table roll up from
    // registered pre-aggregated parquet views instead (plans/
    // MaterializedViewRewrite.scala) — no-op until an MV is registered.
    ext.injectOptimizerRule(_ => graft.plans.MaterializedViewRewrite)
    // ClickHouse arithmetic/logic coercions (DateTime ± int, numeric
    // AND/OR/WHERE, boolean sums) — fires only on trees Spark's own
    // coercion would reject.
    ext.injectResolutionRule(_ => graft.sql.ChCoercions)
    // join_use_nulls=0 outer-join padding (flag-gated; off by default)
    ext.injectPostHocResolutionRule(_ => graft.sql.ChJoinDefaults)
    // CH decimal container guard on constant comparisons (corpus-gated;
    // post-folding so lateral select aliases have inlined)
    ext.injectOptimizerRule(_ => graft.sql.ChDecimalCompareGuard)
    // ROLLUP/CUBE sub-total keys as type defaults (flag-gated; off by
    // default)
    ext.injectOptimizerRule(_ => graft.sql.ChRollupDefaults)
    // ClickHouse-dialect function spellings → native Catalyst expressions.
    graft.sql.ClickHouseAliases.inject(ext)
  }
}
