package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The reference's AUC-heuristic aggregate family
  * (/root/reference/src/AggregateFunctions/AggregateFunctionFastAuc2.h,
  * FastAuc3.h, FastPrevAuc2.h, DebiasAuc.h): predictions are histogrammed
  * into fixed-width buckets over [min, max) (bucket = ⌊(pred−min)/precision⌋
  * clamped to [0, bucket_num−1], bucket_num = ⌈(max−min)/precision⌉),
  * positives/negatives (label > 0) counted per bucket, and the result is the
  * Mann-Whitney AUC over the bucketed ranks with average-rank tie handling:
  *
  *   AUC = Σ_b pos_b · (cumNeg_{<b} + neg_b/2) / (ΣposΣneg),   1.0 if a side is empty.
  *
  * This pairwise form is algebraically identical to the reference's
  * rank-sum form ((Σ avgRank_b·pos_b − P(P+1)/2)/(P·N)). We follow
  * fastAuc3's float64 accumulation; fastAuc2/fastPrevAuc2 accumulate the
  * rank sum in a UInt64 (truncating fractional half-ranks per bucket) —
  * a documented sub-rank rounding divergence, not reproduced. Reference
  * out-of-range preds below `min` hit UB in the C++ cast; we clamp to
  * bucket 0.
  *
  * debiasAuc (DebiasAuc.h) is the same computation with each row weighted
  * 1/sample_rate — callers pass the weight expression; the plain spellings
  * pass weight 1.
  *
  * State is a sparse bucket→(pos, neg) map (≤ bucket_num entries, usually
  * far fewer), so partials are tiny and merge is a map add —
  * order-independent and exchange-friendly, unlike the streaming fastAuc.
  */
case class BucketedRankAucAgg(
    pred: Expression,
    label: Expression,
    weight: Expression,
    precision: Double,
    minVal: Double,
    maxVal: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, (Double, Double)]]
  with TernaryLike[Expression] {

  require(precision > 0.0, s"fastAuc2: precision must be > 0, got $precision")
  require(maxVal > minVal, s"fastAuc2: max must be > min")

  private val bucketNum: Int = math.ceil((maxVal - minVal) / precision).toInt

  override def first: Expression = pred
  override def second: Expression = label
  override def third: Expression = weight
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.HashMap[Int, (Double, Double)] =
    mutable.HashMap.empty

  private def bucketOf(p: Double): Int = {
    val raw = ((p - minVal) / precision).toLong
    math.min(math.max(raw, 0L), (bucketNum - 1).toLong).toInt
  }

  override def update(
      b: mutable.HashMap[Int, (Double, Double)],
      input: InternalRow): mutable.HashMap[Int, (Double, Double)] = {
    val p = pred.eval(input)
    val l = label.eval(input)
    val w = weight.eval(input)
    if (p != null && l != null && w != null) {
      val k = bucketOf(p.asInstanceOf[Number].doubleValue())
      val wd = w.asInstanceOf[Number].doubleValue()
      val (cp, cn) = b.getOrElse(k, (0.0, 0.0))
      if (l.asInstanceOf[Number].doubleValue() > 0) b.update(k, (cp + wd, cn))
      else b.update(k, (cp, cn + wd))
    }
    b
  }

  override def merge(
      b: mutable.HashMap[Int, (Double, Double)],
      other: mutable.HashMap[Int, (Double, Double)]): mutable.HashMap[Int, (Double, Double)] = {
    other.foreach { case (k, (p, n)) =>
      val (cp, cn) = b.getOrElse(k, (0.0, 0.0))
      b.update(k, (cp + p, cn + n))
    }
    b
  }

  override def eval(b: mutable.HashMap[Int, (Double, Double)]): Any = {
    val keys = b.keys.toArray.sorted
    var totPos = 0.0
    var totNeg = 0.0
    keys.foreach { k => val (p, n) = b(k); totPos += p; totNeg += n }
    if (totPos == 0.0 || totNeg == 0.0) return 1.0
    var cumNeg = 0.0
    var acc = 0.0
    keys.foreach { k =>
      val (p, n) = b(k)
      acc += p * (cumNeg + n / 2.0)
      cumNeg += n
    }
    acc / totPos / totNeg
  }

  override def serialize(b: mutable.HashMap[Int, (Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, (p, n)) => out.writeInt(k); out.writeDouble(p); out.writeDouble(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, (Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[Int, (Double, Double)]
    (0 until n).foreach { _ =>
      val k = in.readInt(); b.update(k, (in.readDouble(), in.readDouble()))
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): BucketedRankAucAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BucketedRankAucAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(pred = newFirst, label = newSecond, weight = newThird)
  override def prettyName: String = "fast_auc2"
}

/** ecpmAuc (reference AggregateFunctionEcpmAuc.h): ranking quality of an
  * eCPM ordering against advertiser value. Rows are bucketed DESCENDING by
  * log10(ecpm): bucket = ⌊(max − log10(ecpm)) / (precision·(max−min))⌋
  * clamped to [0, ⌈1/precision⌉−1] (defaults precision=1e-5, min=−2.5,
  * max=2.5), accumulating (impression count, Σ adv_value) per bucket. The
  * result averages the lower/upper trapezoid bounds of the value-weighted
  * concordance curve walked in bucket order:
  *
  *   lb += cnt_b·cumAdv_{<b};  ub += cnt_b·cumAdv_{≤b};
  *   result = (lb+ub) / (2·Σcnt·Σadv)
  *
  * Same sparse-map state/merge shape as [[BucketedRankAucAgg]]. A
  * non-positive ecpm (log10 → NaN/−∞) clamps to the last bucket here;
  * the reference's UInt64 cast of NaN is UB.
  */
case class EcpmAucAgg(
    ecpm: Expression,
    advValue: Expression,
    precision: Double,
    minVal: Double,
    maxVal: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, (Double, Double)]]
  with BinaryLike[Expression] {

  require(precision > 0.0 && precision <= 1.0, "ecpmAuc: precision must be in (0, 1]")
  require(maxVal > minVal, "ecpmAuc: max must be > min")

  private val interval: Double = maxVal - minVal
  private val bucketNum: Int = math.ceil(1.0 / precision).toInt

  override def left: Expression = ecpm
  override def right: Expression = advValue
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.HashMap[Int, (Double, Double)] =
    mutable.HashMap.empty

  private def bucketOf(e: Double): Int = {
    val l = math.log10(e)
    if (l.isNaN) return bucketNum - 1
    val raw = ((maxVal - l) / (precision * interval)).toLong
    math.min(math.max(raw, 0L), (bucketNum - 1).toLong).toInt
  }

  override def update(
      b: mutable.HashMap[Int, (Double, Double)],
      input: InternalRow): mutable.HashMap[Int, (Double, Double)] = {
    val e = ecpm.eval(input)
    val a = advValue.eval(input)
    if (e != null && a != null) {
      val k = bucketOf(e.asInstanceOf[Number].doubleValue())
      val (cc, ca) = b.getOrElse(k, (0.0, 0.0))
      b.update(k, (cc + 1.0, ca + a.asInstanceOf[Number].doubleValue()))
    }
    b
  }

  override def merge(
      b: mutable.HashMap[Int, (Double, Double)],
      other: mutable.HashMap[Int, (Double, Double)]): mutable.HashMap[Int, (Double, Double)] = {
    other.foreach { case (k, (c, a)) =>
      val (cc, ca) = b.getOrElse(k, (0.0, 0.0))
      b.update(k, (cc + c, ca + a))
    }
    b
  }

  override def eval(b: mutable.HashMap[Int, (Double, Double)]): Any = {
    val keys = b.keys.toArray.sorted
    var totalEcpm = 0.0
    var totalAdv = 0.0
    var lb = 0.0
    var ub = 0.0
    keys.foreach { k =>
      val (cnt, adv) = b(k)
      lb += cnt * totalAdv
      totalEcpm += cnt
      totalAdv += adv
      ub += cnt * totalAdv
    }
    if (totalEcpm == 0.0 || totalAdv == 0.0) return 1.0
    (lb + ub) / (totalEcpm * totalAdv * 2.0)
  }

  override def serialize(b: mutable.HashMap[Int, (Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, (c, a)) => out.writeInt(k); out.writeDouble(c); out.writeDouble(a) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, (Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[Int, (Double, Double)]
    (0 until n).foreach { _ =>
      val k = in.readInt(); b.update(k, (in.readDouble(), in.readDouble()))
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): EcpmAucAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): EcpmAucAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(ecpm = newLeft, advValue = newRight)
  override def prettyName: String = "ecpm_auc"
}

/** regAuc / regAucV2 (reference AggregateFunctionRegAuc.h, RegAucV2.h):
  * regression-AUC as the fraction of "correct" (pred, label) pairs among
  * all unordered pairs, with four tie-handling flags (the comment block at
  * RegAucV2.h:93):
  *
  *   flag 1: correct = strictly concordant ∪ (pred tie ∧ label tie);  denom = C(n,2)
  *   flag 2: correct = strictly concordant ∪ label tie;               denom = C(n,2)
  *   flag 3: correct = strictly concordant;                           denom = C(n,2)
  *   flag 4: correct = strictly concordant;                           denom = C(n,2) − #(label ties)
  *
  * Returns −1.0 when the denominator is 0 (the reference's error code).
  *
  * Deliberate divergences, both documented: (a) when the pair count
  * exceeds `num_reg_sample` the reference Monte-Carlo samples pairs with a
  * `random_device`-seeded RNG — inherently nondeterministic — while we
  * always compute the exact fraction (the quantity the sample estimates);
  * (b) regAuc-v1's tie-group loops miscount the final run
  * (`j+1==n` handling, fixed in V2) — both spellings here use the correct
  * V2 counting.
  *
  * The strictly-concordant count is O(n log n): sort by (pred, label),
  * then a Fenwick tree over label ranks counts, for each equal-pred batch,
  * the already-inserted rows with strictly smaller pred and label. The
  * buffered state is the (pred, label) pair list, as in the reference.
  */
case class RegAucAgg(
    pred: Expression,
    label: Expression,
    flag: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]]
  with BinaryLike[Expression] {

  require(flag >= 1 && flag <= 4, s"regAuc: flag must be in 1..4, got $flag")

  override def left: Expression = pred
  override def right: Expression = label
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      b: mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val p = pred.eval(input)
    val l = label.eval(input)
    if (p != null && l != null) {
      b += ((p.asInstanceOf[Number].doubleValue(), l.asInstanceOf[Number].doubleValue()))
    }
    b
  }

  override def merge(
      b: mutable.ArrayBuffer[(Double, Double)],
      other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    b ++= other
    b
  }

  override def eval(b: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val n = b.length
    val total = n.toLong * (n - 1) / 2
    if (total == 0) return -1.0

    val arr = b.toArray.sortBy(x => (x._1, x._2))

    // Dense label ranks for the Fenwick tree.
    val labels = arr.map(_._2).distinct.sorted
    val rankOf = labels.zipWithIndex.toMap
    val tree = new Array[Long](labels.length + 1)
    def add(i0: Int): Unit = {
      var i = i0 + 1
      while (i <= labels.length) { tree(i) += 1; i += i & (-i) }
    }
    def countLess(i0: Int): Long = { // # inserted with rank < i0
      var i = i0; var s = 0L
      while (i > 0) { s += tree(i); i -= i & (-i) }
      s
    }

    // Strictly concordant pairs: batch rows of equal pred so only
    // strictly-smaller preds are in the tree when counting.
    var concordant = 0L
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && arr(j)._1 == arr(i)._1) j += 1
      var k = i
      while (k < j) { concordant += countLess(rankOf(arr(k)._2)); k += 1 }
      k = i
      while (k < j) { add(rankOf(arr(k)._2)); k += 1 }
      i = j
    }

    // Tie-group counts.
    def runPairs(sorted: Array[(Double, Double)], same: ((Double, Double), (Double, Double)) => Boolean): Long = {
      var s = 0L; var a = 0
      while (a < sorted.length) {
        var c = a
        while (c < sorted.length && same(sorted(c), sorted(a))) c += 1
        val len = (c - a).toLong
        s += len * (len - 1) / 2
        a = c
      }
      s
    }
    val tieBoth = runPairs(arr, (x, y) => x._1 == y._1 && x._2 == y._2)
    val byLabel = b.toArray.sortBy(_._2)
    val tieLabel = runPairs(byLabel, (x, y) => x._2 == y._2)

    val (correct, denom) = flag match {
      case 1 => (concordant + tieBoth, total)
      case 2 => (concordant + tieLabel, total)
      case 3 => (concordant, total)
      case 4 => (concordant, total - tieLabel)
    }
    if (denom <= 0) -1.0 else correct.toDouble / denom
  }

  override def serialize(b: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { case (p, l) => out.writeDouble(p); out.writeDouble(l) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.ArrayBuffer.empty[(Double, Double)]
    (0 until n).foreach { _ => b += ((in.readDouble(), in.readDouble())) }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): RegAucAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): RegAucAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(pred = newLeft, label = newRight)
  override def prettyName: String = "reg_auc"
}

/** fastAuc (reference AggregateFunctionFastAuc.h): a single-pass streaming
  * AUC heuristic. Classification mode: each positive (label > 1e-6) is
  * compared against the LAST-SEEN negative's pred (concordant if strictly
  * greater) and vice versa (concordant if strictly smaller), then recorded
  * as the new last-seen pred of its class; the sentinels start at −1, so
  * predictions are assumed ≥ 0. Regression mode compares every row to the
  * immediately preceding row (concordant if both pred and label are ≥ the
  * previous). Result = sum_pos / (sum_pos + sum_neg), 1.0 on no pairs.
  *
  * The metric is ARRIVAL-ORDER-DEPENDENT by construction. The reference's
  * distributed merge just adds the two counters (dropping cross-boundary
  * comparisons); we instead buffer (pred, label) in arrival order,
  * concatenate on merge, and replay the scan at eval — identical to the
  * reference on a single stream, and deterministic for a given partition
  * layout, but like the reference the value is only well-defined when the
  * caller controls input order. Gated rows-only plus hand-traced
  * single-partition specs.
  */
case class FastAucAgg(
    pred: Expression,
    label: Expression,
    isRegression: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]]
  with BinaryLike[Expression] {

  override def left: Expression = pred
  override def right: Expression = label
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      b: mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val p = pred.eval(input)
    val l = label.eval(input)
    if (p != null && l != null) {
      b += ((p.asInstanceOf[Number].doubleValue(), l.asInstanceOf[Number].doubleValue()))
    }
    b
  }

  override def merge(
      b: mutable.ArrayBuffer[(Double, Double)],
      other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    b ++= other
    b
  }

  override def eval(b: mutable.ArrayBuffer[(Double, Double)]): Any = {
    var sumPos = 0L
    var sumNeg = 0L
    var lastPos = -1.0
    var lastNeg = -1.0
    var lastPred = -1.0
    var lastLabel = -1.0
    var count = 0L
    b.foreach { case (p, l) =>
      if (!isRegression) {
        if (l > 1e-6) {
          if (lastNeg >= 0) { if (p > lastNeg) sumPos += 1 else sumNeg += 1 }
          lastPos = p
        } else {
          if (lastPos >= 0) { if (p < lastPos) sumPos += 1 else sumNeg += 1 }
          lastNeg = p
        }
      } else {
        if (count > 0) {
          if (p >= lastPred && l >= lastLabel) sumPos += 1 else sumNeg += 1
        }
        lastPred = p
        lastLabel = l
        count += 1
      }
    }
    if (sumPos + sumNeg == 0) 1.0 else sumPos.toDouble / (sumPos + sumNeg)
  }

  override def serialize(b: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { case (p, l) => out.writeDouble(p); out.writeDouble(l) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.ArrayBuffer.empty[(Double, Double)]
    (0 until n).foreach { _ => b += ((in.readDouble(), in.readDouble())) }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): FastAucAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FastAucAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(pred = newLeft, label = newRight)
  override def prettyName: String = "fast_auc"
}

/** Column-API entry points for the AUC family. */
object AucFamily {
  def fastAuc2(pred: Column, label: Column,
      precision: Double = 0.00001, min: Double = 0.0, max: Double = 1.0): Column =
    ColumnBridge.column(BucketedRankAucAgg(
      ColumnBridge.expression(pred), ColumnBridge.expression(label),
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      precision, min, max).toAggregateExpression())

  def debiasAuc(pred: Column, label: Column, sampleRate: Column,
      precision: Double = 0.00001, min: Double = 0.0, max: Double = 1.0): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Literal}
    ColumnBridge.column(BucketedRankAucAgg(
      ColumnBridge.expression(pred), ColumnBridge.expression(label),
      Divide(Literal(1.0), Cast(ColumnBridge.expression(sampleRate), DoubleType)),
      precision, min, max).toAggregateExpression())
  }

  def ecpmAuc(ecpm: Column, advValue: Column,
      precision: Double = 0.00001, min: Double = -2.5, max: Double = 2.5): Column =
    ColumnBridge.column(EcpmAucAgg(
      ColumnBridge.expression(ecpm), ColumnBridge.expression(advValue),
      precision, min, max).toAggregateExpression())

  def regAuc(pred: Column, label: Column, flag: Int = 1): Column =
    ColumnBridge.column(RegAucAgg(
      ColumnBridge.expression(pred), ColumnBridge.expression(label), flag)
      .toAggregateExpression())

  def fastAuc(pred: Column, label: Column, isRegression: Boolean = false): Column =
    ColumnBridge.column(FastAucAgg(
      ColumnBridge.expression(pred), ColumnBridge.expression(label), isRegression)
      .toAggregateExpression())
}
