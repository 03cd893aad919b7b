package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** ClickHouse arithmetic/logic coercions Spark's own TypeCoercion
  * rejects (reference src/Functions/FunctionsConversion.h and the
  * IFunction overload resolvers accept these by construction):
  *
  *  - DateTime ± integer = seconds; Date ± integer = days
  *    (FunctionDateOrDateTimeAddInterval.h default unit).
  *  - sum/avg over UInt8-as-boolean (comparisons are UInt8 in CH; the
  *    engine surfaces them as BooleanType).
  *  - AND/OR/NOT/IF/WHERE over numbers: nonzero = true
  *    (FunctionsLogical.cpp).
  *  - comparisons mixing boolean and number compare as 0/1.
  *
  * A resolution rule, not parser work: every case fires only on trees
  * Spark's analyzer would otherwise reject, so green queries are
  * untouched and the rewrite is idempotent.
  */
object ChCoercions extends Rule[LogicalPlan] {

  /** Session flag for the IEEE `/` rewrite (corpus runner only). */
  val IeeeDivFlag = "spark.graft.chIeeeDivision"

  private def ok(es: Expression*): Boolean = es.forall(_.resolved)
  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]
  private def isTs(e: Expression): Boolean = e.dataType == TimestampType
  private def isDate(e: Expression): Boolean = e.dataType == DateType
  private def isBool(e: Expression): Boolean = e.dataType == BooleanType

  private def toBool(e: Expression): Expression =
    Not(EqualTo(Cast(e, DoubleType), Literal(0.0d)))

  private def isTime(e: Expression): Boolean = e.dataType match {
    case st: StructType => st.fieldNames.sameElements(Array("__time"))
    case _ => false
  }
  /** The declared column timezone of an attribute (graft.ch.tz). */
  private def colTz(e: Expression): Option[String] = e match {
    case a: AttributeReference if a.metadata.contains("graft.ch.tz") =>
      Some(a.metadata.getString("graft.ch.tz"))
    case _ => None
  }
  /** A foldable string operand — bare, or already session-zone-cast to
    * timestamp by an earlier coercion pass. */
  private def strLit(e: Expression): Option[Expression] = e match {
    case s if s.dataType == StringType && s.foldable => Some(s)
    case Cast(s, TimestampType, _, _)
        if s.dataType == StringType && s.foldable => Some(s)
    case _ => None
  }
  private def isInterval(e: Expression): Boolean = e.dataType match {
    case CalendarIntervalType => true
    case _: DayTimeIntervalType => true
    case _: YearMonthIntervalType => true
    case _ => false
  }
  private def timePlus(l: Expression, r: Expression,
      negate: Boolean): Expression = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    val seconds: Long = r.eval() match {
      case null => 0L
      case iv: org.apache.spark.unsafe.types.CalendarInterval =>
        iv.days.toLong * 86400L + iv.microseconds / 1000000L
      case micros: Long if r.dataType.isInstanceOf[DayTimeIntervalType] =>
        micros / 1000000L
      case _ => 0L // year-month interval: identity on a time-of-day
    }
    if (seconds == 0L) l
    else CreateNamedStruct(Seq(Literal("__time"),
      StaticInvoke(graft.functions.TimeOps.getClass, StringType,
        "addSeconds",
        Seq(GetStructField(l, 0, Some("__time")),
          Literal(if (negate) -seconds else seconds)),
        Seq(StringType, LongType))))
  }

  /** Same-arity structs whose field types differ but are all atomic —
    * the shape Spark's struct-equality check rejects. */
  private def structMismatch(l: Expression, r: Expression): Boolean =
    (l.dataType, r.dataType) match {
      case (lt: StructType, rt: StructType) =>
        lt.length == rt.length && lt.length > 0 &&
          lt.fields.map(_.dataType).toSeq !=
            rt.fields.map(_.dataType).toSeq &&
          lt.fields.zip(rt.fields).forall { case (a, b) =>
            atomic(a.dataType) && atomic(b.dataType) }
      case _ => false
    }

  private def atomic(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
        TimestampType | BinaryType => true
    case _ => false
  }

  /** One side a decimal, the other a foldable integral/decimal constant
    * that cannot be rescaled into the decimal's CH container int. */
  private[sql] def decimalConstOverflow(l: Expression, r: Expression): Boolean = {
    // the CONTAINER is the column's ORIGINAL decimal family — comparison
    // coercion wraps it in widening casts before this rule runs
    @scala.annotation.tailrec
    def base(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => base(c)
      case other => other
    }
    def check(dec0: Expression, const: Expression): Boolean = {
      val dec = base(dec0)
      (dec.dataType, const.dataType) match {
        case (dt: DecimalType, t)
            if const.foldable && !dec.foldable &&
              (t.isInstanceOf[DecimalType] || t == ByteType ||
                t == ShortType || t == IntegerType || t == LongType) =>
          val p = dt.precision
          val s = dt.scale
          val v = const.eval() match {
            case null => return false
            case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
            case n: Number => new java.math.BigDecimal(n.toString)
            case _ => return false
          }
          val container: java.math.BigDecimal =
            if (p <= 9) new java.math.BigDecimal(Int.MaxValue)
            else if (p <= 18) new java.math.BigDecimal(Long.MaxValue)
            else new java.math.BigDecimal(
              java.math.BigInteger.ONE.shiftLeft(127))
          v.abs.movePointRight(s).compareTo(container) > 0
        case _ => false
      }
    }
    check(l, r) || check(r, l)
  }

  /** Strip coercion casts; Some((expr, decimalType)) when the base is
    * genuinely decimal. */
  private def origDecimal(e: Expression): Option[(Expression, DecimalType)] = {
    @scala.annotation.tailrec
    def base(x: Expression): Expression = x match {
      case Cast(c, _, _, _) => base(c)
      case other => other
    }
    val b = base(e)
    b.dataType match {
      case dt: DecimalType => Some((b, dt))
      case _ => None
    }
  }

  /** Strip coercion casts; Some(expr) when the base is integral. */
  private def integralBase(e: Expression): Option[Expression] = {
    @scala.annotation.tailrec
    def base(x: Expression): Expression = x match {
      case Cast(c, _, _, _) => base(c)
      case other => other
    }
    val b = base(e)
    if (integral(b)) Some(b) else None
  }

  /** CH decimal family container bits from declared precision. */
  private def familyBits(p: Int): Int =
    if (p <= 9) 32 else if (p <= 18) 64 else 128

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.resolveOperatorsUp {
      case f @ Filter(cond, _) if cond.resolved && numeric(cond) =>
        f.copy(condition = toBool(cond))
      case q =>
        q.transformExpressionsUp {
          // CH Time ± INTERVAL: hour/minute/second (and day-time) parts
          // add modulo 24h; year-month parts are identity (10080_*).
          // Foldable intervals only — the corpus writes literals.
          case Add(l, r, _) if ok(l, r) && isTime(l) && isInterval(r) &&
              r.foldable =>
            timePlus(l, r, negate = false)
          case Subtract(l, r, _) if ok(l, r) && isTime(l) && isInterval(r) &&
              r.foldable =>
            timePlus(l, r, negate = true)
          // ResolveBinaryArithmetic eagerly lowers `x ± interval` to
          // TimestampAddInterval before this rule sees the Add
          case ta: TimestampAddInterval if ok(ta.left, ta.right) &&
              isTime(ta.left) && ta.right.foldable =>
            timePlus(ta.left, ta.right, negate = false)
          case Add(l, r, f) if ok(l, r) && isTs(l) && integral(r) =>
            TimestampAdd("SECOND", Cast(r, LongType), l)
          case Add(l, r, f) if ok(l, r) && integral(l) && isTs(r) =>
            TimestampAdd("SECOND", Cast(l, LongType), r)
          case Subtract(l, r, f) if ok(l, r) && isTs(l) && integral(r) =>
            TimestampAdd("SECOND", UnaryMinus(Cast(r, LongType)), l)
          case Add(l, r, f) if ok(l, r) && isDate(l) && integral(r) =>
            DateAdd(l, Cast(r, IntegerType))
          case Add(l, r, f) if ok(l, r) && integral(l) && isDate(r) =>
            DateAdd(r, Cast(l, IntegerType))
          case Subtract(l, r, f) if ok(l, r) && isDate(l) && integral(r) =>
            DateSub(l, Cast(r, IntegerType))
          // Spark's own coercion builds DateAdd/DateSub from Date ± N
          // but leaves a BIGINT count untyped — tighten it
          case DateAdd(d, n) if ok(d, n) && integral(n) &&
              n.dataType != IntegerType =>
            DateAdd(d, Cast(n, IntegerType))
          case DateSub(d, n) if ok(d, n) && integral(n) &&
              n.dataType != IntegerType =>
            DateSub(d, Cast(n, IntegerType))
          // CH `/` is Float64 division by definition — non-decimal
          // operands divide as IEEE doubles (0/0 = nan, 1/0 = inf),
          // never an ANSI error; Decimal division keeps ANSI (the
          // reference errors on Decimal/0 too). Unlike every other case
          // here this rewrites trees Spark ACCEPTS, so it is gated to
          // the CH-strict corpus session (native Divide keeps the
          // cleaner plans for library users).
          case d: Divide
              if d.evalMode == EvalMode.ANSI && ok(d.left, d.right) &&
                org.apache.spark.sql.internal.SQLConf.get
                  .getConfString(IeeeDivFlag, "false") == "true" &&
                !d.left.dataType.isInstanceOf[DecimalType] &&
                !d.right.dataType.isInstanceOf[DecimalType] &&
                d.left.dataType.isInstanceOf[NumericType] &&
                d.right.dataType.isInstanceOf[NumericType] => {
            // JVM double division IS the IEEE semantics (inf/nan)
            import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
            StaticInvoke(graft.functions.MathOps.getClass, DoubleType,
              "ieeeDiv",
              Seq(Cast(d.left, DoubleType), Cast(d.right, DoubleType)),
              Seq(DoubleType, DoubleType), returnNullable = false)
          }
          // CH decimal division: result scale = the DIVIDEND's scale,
          // truncation, container-checked intermediate (00700 —
          // toDecimal32(n1/9, …) wants 0.5555 truncated at n1's scale,
          // not Spark's widened HALF_UP 0.555556). Corpus-gated; the
          // dividend must be an ORIGINAL decimal (not coercion's cast
          // of an integer, whose CH semantics differ).
          case dv: Divide
              if ok(dv.left, dv.right) &&
                org.apache.spark.sql.internal.SQLConf.get
                  .getConfString(IeeeDivFlag, "false") == "true" &&
                origDecimal(dv.left).isDefined &&
                (integralBase(dv.right).isDefined ||
                  origDecimal(dv.right).isDefined) => {
            import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
            val (lExpr, lt) = origDecimal(dv.left).get
            val lBits = familyBits(lt.precision)
            integralBase(dv.right) match {
              case Some(ir) =>
                StaticInvoke(graft.functions.MathOps.getClass,
                  DecimalType(graft.functions.MathOps
                    .decimalContainerDigits(lBits), lt.scale),
                  "chDecimalDivInt",
                  Seq(lExpr, Cast(ir, LongType), Literal(lBits),
                    Literal(lt.scale)),
                  Seq(lt, LongType, IntegerType, IntegerType))
              case None =>
                val (rExpr, rt) = origDecimal(dv.right).get
                val bits = math.max(lBits, familyBits(rt.precision))
                StaticInvoke(graft.functions.MathOps.getClass,
                  DecimalType(graft.functions.MathOps
                    .decimalContainerDigits(bits), lt.scale),
                  "chDecimalDivDec",
                  Seq(lExpr, rExpr, Literal(bits), Literal(lt.scale),
                    Literal(rt.scale)),
                  Seq(lt, rt, IntegerType, IntegerType, IntegerType))
            }
          }
          case s @ Sum(c, _) if c.resolved && isBool(c) =>
            s.copy(child = Cast(c, IntegerType))
          case s: ChSum if s.child.resolved && isBool(s.child) =>
            s.copy(child = Cast(s.child, IntegerType))
          case a @ Average(c, _) if c.resolved && isBool(c) =>
            a.copy(child = Cast(c, IntegerType))
          case And(l, r) if ok(l, r) && numeric(l) && numeric(r) =>
            And(toBool(l), toBool(r))
          case And(l, r) if ok(l, r) && numeric(l) && isBool(r) =>
            And(toBool(l), r)
          case And(l, r) if ok(l, r) && isBool(l) && numeric(r) =>
            And(l, toBool(r))
          case Or(l, r) if ok(l, r) && numeric(l) && numeric(r) =>
            Or(toBool(l), toBool(r))
          case Or(l, r) if ok(l, r) && numeric(l) && isBool(r) =>
            Or(toBool(l), r)
          case Or(l, r) if ok(l, r) && isBool(l) && numeric(r) =>
            Or(l, toBool(r))
          case Not(c) if c.resolved && numeric(c) =>
            EqualTo(Cast(c, DoubleType), Literal(0.0d))
          case If(p, t, e) if p.resolved && numeric(p) =>
            If(toBool(p), t, e)
          // a DateTime('zone') column compares against a string literal
          // parsed in the COLUMN's zone, not the session's (reference
          // column-type timezone; 02739)
          case c: BinaryComparison if ok(c.left, c.right) &&
              colTz(c.left).isDefined && isTs(c.left) &&
              strLit(c.right).isDefined =>
            c.withNewChildren(Seq(c.left,
              Cast(strLit(c.right).get, TimestampType, colTz(c.left))))
          case c: BinaryComparison if ok(c.left, c.right) &&
              colTz(c.right).isDefined && isTs(c.right) &&
              strLit(c.left).isDefined =>
            c.withNewChildren(Seq(
              Cast(strLit(c.left).get, TimestampType, colTz(c.right)),
              c.right))
          case c: BinaryComparison
              if ok(c.left, c.right) && isBool(c.left) && numeric(c.right) =>
            c.withNewChildren(Seq(Cast(c.left, IntegerType), c.right))
          case c: BinaryComparison
              if ok(c.left, c.right) && numeric(c.left) && isBool(c.right) =>
            c.withNewChildren(Seq(c.left, Cast(c.right, IntegerType)))
          // CH compares maps by content; Spark's = has no map ordering —
          // equal maps have equal key-sorted entry arrays
          case EqualTo(l, r)
              if ok(l, r) && l.dataType.isInstanceOf[MapType] &&
                r.dataType.isInstanceOf[MapType] =>
            EqualTo(new SortArray(MapEntries(l)), new SortArray(MapEntries(r)))
          // CH tuple comparison is elementwise with per-field coercion
          // (tuples of mixed decimal widths compare fine — 00700);
          // Spark's struct = struct demands identical field types, so
          // expand to a pairwise conjunction and let the per-field
          // coercion rules align each pair
          case EqualTo(l, r) if ok(l, r) && structMismatch(l, r) =>
            val n = l.dataType.asInstanceOf[StructType].length
            (0 until n).map(i => EqualTo(GetStructField(l, i),
              GetStructField(r, i)): Expression).reduce(And(_, _))
        }
    }
  }
}

/** CH decimal-vs-constant comparison rescales the constant to the
  * decimal's scale INSIDE the decimal's container int (Decimal32→Int32,
  * Decimal64→Int64, else Int128); a constant that overflows the
  * container is error 407, even when a wider comparison would be
  * well-defined (00700_decimal_compare: `g = 30000` with g
  * Decimal32(5)). An OPTIMIZER rule, not a resolution rule: the corpus
  * writes the constant behind a lateral select alias, which only folds
  * to a literal after CollapseProject + ConstantFolding. Corpus-gated
  * by the CH-strict flag.
  */
object ChDecimalCompareGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (org.apache.spark.sql.internal.SQLConf.get
        .getConfString(ChCoercions.IeeeDivFlag, "false") != "true") return plan
    plan.transformAllExpressions {
      case c: BinaryComparison
          if c.left.resolved && c.right.resolved &&
            ChCoercions.decimalConstOverflow(c.left, c.right) =>
        throw new ArithmeticException(
          "Decimal constant comparison overflow (error 407 analog)")
    }
  }
}
