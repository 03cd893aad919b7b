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
  */
final case class SumMapInput(key: String, value: Double)

class SumMap extends Aggregator[SumMapInput, TreeMap[String, Double], Map[String, Double]]
    with Serializable {
  def zero: TreeMap[String, Double] = TreeMap.empty
  def reduce(b: TreeMap[String, Double], e: SumMapInput): TreeMap[String, Double] =
    b.updated(e.key, b.getOrElse(e.key, 0.0) + e.value)
  def merge(a: TreeMap[String, Double], b: TreeMap[String, Double]): TreeMap[String, Double] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0.0) + v) }
  def finish(b: TreeMap[String, Double]): Map[String, Double] = b
  def bufferEncoder: Encoder[TreeMap[String, Double]] = Encoders.kryo
  def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoders.mapStringDouble
}

object SumMap {
  def apply(): UserDefinedFunction = udaf(new SumMap, Encoders.product[SumMapInput])
}
