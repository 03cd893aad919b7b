package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL-surface ASOF join (the reference's Asof join strictness,
  * /root/reference/src/Interpreters/RowRefs.h:210, findAsof:250) as a
  * Catalyst rewrite: users write a plain join with the [[AsofLE]] marker
  *
  * {{{ SELECT ... FROM l [LEFT] JOIN r ON l.k = r.k AND asof_le(r.ts, l.ts) }}}
  *
  * and this rule replaces the Join with the union + per-key running-`last`
  * plan (same rewrite as `graft.operators.AsofJoin.backward`): both sides
  * are tagged and unioned on (key, time, side), a window takes the last
  * right payload at-or-before each left row, and left rows are kept; the
  * right side's columns keep their names/exprIds and read from the
  * matched row. Cost is one shuffle on the key + a per-partition sort —
  * sort-merge-join shape, no O(n·m) pair expansion, which is why ASOF
  * must not plan as a range nested-loop join at scale.
  *
  * INNER keeps only matched left rows; LEFT OUTER keeps all (null
  * payload). Registered through [[graft.GraftExtensions]].
  */
case class AsofLE(rightTime: Expression, leftTime: Expression)
    extends BinaryExpression with Predicate with Unevaluable {
  override def left: Expression = rightTime
  override def right: Expression = leftTime
  override def nullable: Boolean = false
  override def prettyName: String = "asof_le"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofLE =
    copy(rightTime = newLeft, leftTime = newRight)
}

object AsofJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner | LeftOuter, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofLE]) =>
      rewrite(j, l, r, cond).getOrElse {
        // Not throwing: the unsupported conjunct may still be merged or
        // simplified by other rules in this fixed-point batch. If the
        // shape never becomes rewritable, execution fails on the
        // unevaluable asof_le marker — this warning names the real cause.
        logWarning(s"asof_le present but the join is not rewritable " +
          s"(need: equi-key conjuncts + exactly one asof_le(rightTime, leftTime)); " +
          s"condition: ${cond.sql}")
        j
      }
  }

  private def rewrite(
      j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression): Option[LogicalPlan] = {
    val lset = l.outputSet
    val rset = r.outputSet
    val preds = splitConjunctivePredicates(cond)
    val markers = preds.collect { case m: AsofLE => m }
    if (markers.size != 1) return None
    val marker = markers.head
    // asof_le(right_time, left_time): reference-side time <= probe time.
    val (rt, lt) = (marker.rightTime, marker.leftTime)
    if (!rt.references.subsetOf(rset) || !lt.references.subsetOf(lset)) return None
    if (rt.dataType != lt.dataType) return None
    // Every other conjunct must be a cross-side equality — the ASOF keys.
    val keys: Seq[(Expression, Expression)] = preds.filterNot(_ eq marker).map {
      case EqualTo(a, b) if a.references.subsetOf(lset) && b.references.subsetOf(rset) => (a, b)
      case EqualTo(a, b) if a.references.subsetOf(rset) && b.references.subsetOf(lset) => (b, a)
      case _ => return None
    }
    if (keys.isEmpty || keys.exists { case (a, b) => a.dataType != b.dataType })
      return None

    val payloadType = StructType(r.output.map(a =>
      StructField(a.name, a.dataType, nullable = true)))
    // Left branch first so the union keeps the left attrs' exprIds.
    val lProj = Project(
      keys.zipWithIndex.map { case ((lk, _), i) => Alias(lk, s"__k_$i")() } ++
        Seq(Alias(lt, "__t")(), Alias(Literal(1), "__side")(),
            Alias(Literal.create(null, payloadType), "__r")()) ++ l.output, l)
    val rProj = Project(
      keys.zipWithIndex.map { case ((_, rk), i) => Alias(rk, s"__k_$i")() } ++
        Seq(Alias(rt, "__t")(), Alias(Literal(0), "__side")(),
            Alias(CreateNamedStruct(
              r.output.flatMap(a => Seq(Literal(a.name), a))), "__r")()) ++
        l.output.map(a => Alias(Literal.create(null, a.dataType), a.name)()), r)
    val union = Union(Seq(lProj, rProj))

    val out = union.output
    val nK = keys.size
    val kAttrs: Seq[Expression] = out.take(nK)
    val tAttr = out(nK)
    val sideAttr = out(nK + 1)
    val rAttr = out(nK + 2)
    val leftAttrs = out.drop(nK + 3)
    // Right rows sort before left rows at equal time (__side 0 < 1), so a
    // right row at exactly left.time matches — non-strict <=.
    val order = Seq(SortOrder(tAttr, Ascending), SortOrder(sideAttr, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val winExpr = Alias(
      WindowExpression(
        AggregateExpression(Last(rAttr, ignoreNulls = true), Complete, isDistinct = false),
        WindowSpecDefinition(kAttrs, order, frame)), "__match")()
    val win = Window(Seq(winExpr), kAttrs, order, union)
    val mAttr = winExpr.toAttribute

    val keepLeft = EqualTo(sideAttr, Literal(1))
    val filter = j.joinType match {
      case Inner => Filter(And(keepLeft, IsNotNull(mAttr)), win)
      case _     => Filter(keepLeft, win)
    }
    // Rebuild the right side's columns from the matched payload under the
    // ORIGINAL exprIds so the rewrite preserves the Join's output and all
    // parent references keep resolving — downstream, `r.col` means "value
    // from the as-of matched right row" (null when unmatched), exactly
    // DuckDB/ClickHouse ASOF LEFT JOIN semantics.
    val matchCols = r.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(mAttr, i, Some(a.name)), a.name)(exprId = a.exprId,
        qualifier = a.qualifier)
    }
    Some(Project(leftAttrs ++ matchCols, filter))
  }
}
