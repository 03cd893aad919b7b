package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import scala.collection.immutable.TreeMap

/** sumMap (reference Map-combinator family,
  * /root/reference/src/AggregateFunctions/AggregateFunctionSumMap.cpp):
  * per-group map of key → running sum. Buffer is a sorted map so output
  * key order is deterministic; merge is additive, so partial aggregation
  * combines map-side.
  *
  * Values are quantized to long millionths inside the buffer — matching
  * the repo's `graft.Num.D6` determinism convention — so the per-key sum
  * is exact integer arithmetic and independent of partition merge order.
  * Raw double accumulation would make the result depend on which executor
  * merged first. Long micros overflow at a per-key sum of ~9.2e12 units;
  * per-(group, map-key) sums stay far below that even at 100 TB (the
  * global-sum case where micros overflow uses `Num.dsum2` instead).
  */
final case class SumMapInput(key: String, value: Double)

class SumMap extends Aggregator[SumMapInput, TreeMap[String, Long], Map[String, Double]]
    with Serializable {
  def zero: TreeMap[String, Long] = TreeMap.empty
  def reduce(b: TreeMap[String, Long], e: SumMapInput): TreeMap[String, Long] =
    b.updated(e.key, b.getOrElse(e.key, 0L) + math.rint(e.value * 1e6).toLong)
  def merge(a: TreeMap[String, Long], b: TreeMap[String, Long]): TreeMap[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  def finish(b: TreeMap[String, Long]): Map[String, Double] =
    b.map { case (k, micros) => k -> micros / 1e6 }
  def bufferEncoder: Encoder[TreeMap[String, Long]] = Encoders.kryo
  def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoders.mapStringDouble
}

object SumMap {
  def apply(): UserDefinedFunction = udaf(new SumMap, Encoders.product[SumMapInput])
}

/** minMap / maxMap (reference Map-combinator family alongside sumMap,
  * AggregateFunctionSumMap.cpp `minMap`/`maxMap` registrations): per-group
  * map of key → min/max value. Values stay raw doubles — min/max are
  * order-independent by nature, so no quantization is needed.
  */
class MinMaxMap(isMin: Boolean)
    extends Aggregator[SumMapInput, TreeMap[String, Double], Map[String, Double]]
    with Serializable {
  private def pick(a: Double, b: Double): Double =
    if (isMin) math.min(a, b) else math.max(a, b)
  def zero: TreeMap[String, Double] = TreeMap.empty
  def reduce(b: TreeMap[String, Double], e: SumMapInput): TreeMap[String, Double] =
    b.updated(e.key, b.get(e.key).fold(e.value)(pick(_, e.value)))
  def merge(a: TreeMap[String, Double], b: TreeMap[String, Double]): TreeMap[String, Double] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.get(k).fold(v)(pick(_, v))) }
  def finish(b: TreeMap[String, Double]): Map[String, Double] = b
  def bufferEncoder: Encoder[TreeMap[String, Double]] = Encoders.kryo
  def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoders.mapStringDouble
}

object MinMap {
  def apply(): UserDefinedFunction = udaf(new MinMaxMap(true), Encoders.product[SumMapInput])
}

object MaxMap {
  def apply(): UserDefinedFunction = udaf(new MinMaxMap(false), Encoders.product[SumMapInput])
}
