package graft.aggregates

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** attributionAnalysisFuse (reference
  * AggregateFunctionAttributionAnalysisFuse.h:201
  * AggregateFunctionAttributionAnalysisTupleMerge): the second-stage
  * merge of per-user attributionAnalysis tuples. Input is one tuple
  * column (touch_events: array<array<string>> of (event, attribute)
  * pairs, click_cnt, valid_transform_cnt, transform_times,
  * transform_steps, value, contribution — contribution ignored on
  * input); per (event, attribute) key the counts and values are summed
  * and the time/step samples concatenated (integrateOuterResult, :70).
  *
  * Finalize (insertResultInto, :320): ratio = valid/click per key (0 on
  * zero clicks, only when Σvalue > 0), contribution = value/Σvalue, and
  * 10-bucket histograms of the time/step samples with the reference's
  * integer-division gap = (max−min)/10 + 1 over items > 0 (min/max taken
  * over ALL items including zeros); an empty sample list emits [0].
  * The reference's getDistributionByOriginal early-RETURNs out of the
  * whole loop on the first empty list — a plain bug we do not mirror
  * (each key gets its own [0]). Optional top-N-by-value trimming keeps
  * the '$other_conversions' row when need_others is set.
  *
  * Output keys are sorted by (event, attribute) — the reference emits
  * hash/insertion order, which is nondeterministic in any distributed
  * run; sorting is the deterministic re-expression. Output tuple order
  * follows getAttributionAnalysisReturnType: (touch_events, click_cnt,
  * valid_transform_cnt, valid_transform_ratio,
  * transform_time_distribution, transform_step_distribution, value,
  * contribution).
  *
  * State size is #distinct keys plus the raw time/step samples — the
  * same payload the reference ships between fuse stages.
  */
case class AttributionFuseAgg(
    child: Expression,
    topN: Int,
    needOthers: Boolean,
    withCorrelation: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AttributionFuseAgg.State]
  with UnaryLike[Expression] {

  import AttributionFuseAgg._

  override def nullable: Boolean = false
  override def dataType: DataType = {
    val base = Seq(
      StructField("touch_events", ArrayType(ArrayType(StringType))),
      StructField("click_cnt", ArrayType(LongType)),
      StructField("valid_transform_cnt", ArrayType(LongType)),
      StructField("valid_transform_ratio", ArrayType(DoubleType)),
      StructField("transform_time_distribution", ArrayType(ArrayType(LongType))),
      StructField("transform_step_distribution", ArrayType(ArrayType(LongType))),
      StructField("value", ArrayType(DoubleType)),
      StructField("contribution", ArrayType(DoubleType)))
    if (withCorrelation)
      // attributionCorrelationFuse return order (:400): correlation
      // sits second, right after the keys.
      StructType(base.head +: StructField("correlation", ArrayType(DoubleType)) +: base.tail)
    else StructType(base)
  }

  override def createAggregationBuffer(): State = new State

  override def update(b: State, input: InternalRow): State = {
    val row = child.eval(input)
    if (row != null) {
      val t = row.asInstanceOf[InternalRow]
      val events = t.getArray(0)
      val clicks = t.getArray(1)
      val valids = t.getArray(2)
      val times = t.getArray(3)
      val steps = t.getArray(4)
      val values = t.getArray(5)
      // correlation features are collected only from tuples (users) with
      // at least one valid transform anywhere (integrateOuterResult's
      // trans_sum guard, CorrelationFuse.h:96).
      var transSum = 0L
      if (withCorrelation) {
        var j = 0
        while (j < valids.numElements()) { transSum += valids.getLong(j); j += 1 }
      }
      var i = 0
      while (i < events.numElements()) {
        val pair = events.getArray(i)
        val key = (pair.getUTF8String(0).toString,
          if (pair.numElements() > 1 && !pair.isNullAt(1)) pair.getUTF8String(1).toString else "")
        val e = b.entries.getOrElseUpdate(key, new Entry)
        e.clickCnt += clicks.getLong(i)
        e.validCnt += valids.getLong(i)
        e.value += values.getDouble(i)
        addAll(e.times, times.getArray(i))
        addAll(e.steps, steps.getArray(i))
        if (withCorrelation && transSum > 0) {
          e.features += ((clicks.getLong(i).toDouble, valids.getLong(i).toDouble))
        }
        i += 1
      }
    }
    b
  }

  private def addAll(buf: mutable.ArrayBuffer[Long], arr: ArrayData): Unit = {
    var i = 0
    while (i < arr.numElements()) { buf += arr.getLong(i); i += 1 }
  }

  override def merge(b: State, other: State): State = {
    other.entries.foreach { case (k, oe) =>
      val e = b.entries.getOrElseUpdate(k, new Entry)
      e.clickCnt += oe.clickCnt
      e.validCnt += oe.validCnt
      e.value += oe.value
      e.times ++= oe.times
      e.steps ++= oe.steps
      e.features ++= oe.features
    }
    b
  }

  override def eval(b: State): Any = {
    var keys = b.entries.keys.toArray.sorted
    val totalValue = keys.map(b.entries(_).value).sum
    if (topN > 0 && topN < keys.length) {
      // nth_element by value desc (ties: earlier sorted position wins),
      // keep '$other_conversions' when need_others, restore key order.
      val ranked = keys.zipWithIndex
        .filter { case (k, _) => !(needOthers && k._1 == "$other_conversions") }
        .sortBy { case (k, i) => (-b.entries(k).value, i) }
        .take(topN).map(_._1)
      val kept = ranked.toSet ++
        (if (needOthers) keys.filter(_._1 == "$other_conversions").toSet else Set.empty)
      keys = keys.filter(kept.contains)
    }
    def dist(samples: mutable.ArrayBuffer[Long]): GenericArrayData = {
      if (samples.isEmpty) return new GenericArrayData(Array(0L))
      var mx = 0L
      var mn = Long.MaxValue
      samples.foreach { v => if (v > mx) mx = v; if (v < mn) mn = v }
      val gap = (mx - mn) / TransformGapCount + 1
      val out = new Array[Long](TransformGapCount)
      samples.foreach { v => if (v > 0) out(((v - mn) / gap).toInt) += 1 }
      new GenericArrayData(out)
    }
    val entries = keys.map(b.entries)
    val keyCol = new GenericArrayData(keys.map { case (ev, at) =>
      new GenericArrayData(Array[Any](
        UTF8String.fromString(ev), UTF8String.fromString(at)))
    })
    val tail = Seq[Any](
      new GenericArrayData(entries.map(_.clickCnt)),
      new GenericArrayData(entries.map(_.validCnt)),
      new GenericArrayData(entries.map { e =>
        if (totalValue > 0 && e.clickCnt != 0) e.validCnt.toDouble / e.clickCnt else 0.0
      }),
      new GenericArrayData(entries.map(e => dist(e.times))),
      new GenericArrayData(entries.map(e => dist(e.steps))),
      new GenericArrayData(entries.map(_.value)),
      new GenericArrayData(entries.map { e =>
        if (totalValue > 0) e.value / totalValue else 0.0
      }))
    if (withCorrelation) {
      // The reference computes correlations only on the untrimmed path
      // (CorrelationFuse.h:512-523 — after a top-N trim the correlation
      // vector is left empty); we emit 0.0 for trimmed keys instead of a
      // ragged tuple.
      val corr = new GenericArrayData(entries.map { e =>
        if (topN > 0) 0.0 else spearman(e.features)
      })
      InternalRow((keyCol +: corr +: tail): _*)
    } else {
      InternalRow((keyCol +: tail): _*)
    }
  }

  /** getRankCorrelation (CorrelationFuse.h:260): Spearman over the
    * (click, valid) pairs — descending ties-averaged ranks on both
    * coordinates, 1 − 6Σd²/(n(n²−1)); 0 when the per-tie-group y sum is
    * zero or the formula degenerates to NaN (n ≤ 1).
    */
  private def spearman(features: mutable.ArrayBuffer[(Double, Double)]): Double = {
    val n = features.length
    if (n == 0) return 0.0
    def ranks(vals: Array[Double]): Array[Double] = {
      val idx = vals.zipWithIndex.sortBy(-_._1)
      val out = new Array[Double](n)
      var j = 0
      while (j < n) {
        var k = j
        while (k < n - 1 && idx(k + 1)._1 == idx(j)._1) k += 1
        val avg = (j + 1 + k + 1) / 2.0
        (j to k).foreach(m => out(idx(m)._2) = avg)
        j = k + 1
      }
      out
    }
    // sumy in the reference accumulates the FIRST y of each tie run — a
    // zero-check quirk; all-zero y still yields 0 here, which is the
    // only behavioral consequence.
    if (features.forall(_._2 == 0.0)) return 0.0
    val rx = ranks(features.map(_._1).toArray)
    val ry = ranks(features.map(_._2).toArray)
    var d2 = 0.0
    var i = 0
    while (i < n) { val d = rx(i) - ry(i); d2 += d * d; i += 1 }
    val ans = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
    if (ans.isNaN) 0.0 else ans
  }

  override def serialize(b: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.entries.size)
    b.entries.foreach { case ((ev, at), e) =>
      out.writeUTF(ev); out.writeUTF(at)
      out.writeLong(e.clickCnt); out.writeLong(e.validCnt); out.writeDouble(e.value)
      out.writeInt(e.times.length); e.times.foreach(out.writeLong)
      out.writeInt(e.steps.length); e.steps.foreach(out.writeLong)
      out.writeInt(e.features.length)
      e.features.foreach { case (x, y) => out.writeDouble(x); out.writeDouble(y) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new State
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val key = (in.readUTF(), in.readUTF())
      val e = new Entry
      e.clickCnt = in.readLong(); e.validCnt = in.readLong(); e.value = in.readDouble()
      (0 until in.readInt()).foreach(_ => e.times += in.readLong())
      (0 until in.readInt()).foreach(_ => e.steps += in.readLong())
      (0 until in.readInt()).foreach(_ => e.features += ((in.readDouble(), in.readDouble())))
      b.entries.update(key, e)
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): AttributionFuseAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): AttributionFuseAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "attribution_analysis_fuse"
}

object AttributionFuseAgg {
  val TransformGapCount = 10

  final class Entry extends Serializable {
    var clickCnt: Long = 0L
    var validCnt: Long = 0L
    var value: Double = 0.0
    val times: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
    val steps: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
    val features: mutable.ArrayBuffer[(Double, Double)] = mutable.ArrayBuffer.empty
  }

  final class State extends Serializable {
    val entries: mutable.LinkedHashMap[(String, String), Entry] = mutable.LinkedHashMap.empty
  }
}
