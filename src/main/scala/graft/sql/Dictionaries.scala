package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-RAM SQL dictionaries (reference src/Dictionaries/ — flat/hashed
  * dictionaries: small key→attributes tables resident on every server,
  * queried with dictGet*). The Spark-native shape is the same contract:
  * a dictionary FITS IN MEMORY by definition, so registration collects
  * the dimension once on the driver and the lookup map ships to
  * executors inside the generated code's closure — the scalar lookups
  * then cost zero shuffles and zero joins on the fact side, exactly like
  * the reference's in-process dictGet. Dimensions too large for that
  * contract stay on the broadcast-join path (`dict_lookup`).
  *
  * Values are pre-converted to Catalyst internal types (UTF8String etc.)
  * at registration so the codegen StaticInvoke lookups return them
  * directly.
  */
object Dictionaries {

  final case class Dict(
      name: String,
      keyCol: String,
      attrs: Map[String, (DataType, Map[Long, Any])],
      parentAttr: Option[String])

  private val registry = new ConcurrentHashMap[String, Dict]()

  /** Register (or replace) a dictionary from a dimension DataFrame.
    * `parentAttr`, when given, marks the attribute holding the parent
    * key of a hierarchical dictionary (dictGetHierarchy/dictIsIn).
    */
  def register(
      name: String,
      dim: DataFrame,
      keyCol: String,
      parentAttr: Option[String] = None): Unit = {
    val schema = dim.schema
    val rows = dim.collect()
    val keyIdx = schema.fieldIndex(keyCol)
    val attrs = schema.fields.zipWithIndex.filterNot(_._1.name == keyCol).map {
      case (f, i) =>
        val conv = CatalystTypeConverters.createToCatalystConverter(f.dataType)
        val m = rows.iterator
          .filter(r => !r.isNullAt(keyIdx) && !r.isNullAt(i))
          .map(r => (anyToLong(r.get(keyIdx)), conv(r.get(i))))
          .toMap
        f.name -> (f.dataType, m)
    }.toMap
    parentAttr.foreach(p => require(attrs.contains(p),
      s"dictionary $name: parent attribute $p not found"))
    registry.put(name, Dict(name, keyCol, attrs, parentAttr))
  }

  def drop(name: String): Unit = registry.remove(name)

  private def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => other.toString.toLong
  }

  private[sql] def dict(name: String): Dict = {
    val d = registry.get(name)
    require(d != null, s"dictionary '$name' is not registered")
    d
  }

  /** Attribute type, consulted by the dialect builder at plan build time
    * (the reference reads the same thing from the dictionary DDL).
    */
  def attrType(name: String, attr: String): DataType = {
    val d = dict(name)
    d.attrs.getOrElse(attr,
      throw new IllegalArgumentException(
        s"dictionary '$name' has no attribute '$attr'"))._1
  }

  // --- runtime lookups (StaticInvoke targets; internal-typed values) ---

  def getValue(name: UTF8String, attr: UTF8String, key: Long): Any =
    dict(name.toString).attrs(attr.toString)._2.getOrElse(key, null)

  def has(name: UTF8String, key: Long): Boolean = {
    val d = dict(name.toString)
    d.attrs.valuesIterator.exists(_._2.contains(key))
  }

  /** Key chain from `key` up the parent links, key itself first —
    * reference hierarchical dictGetHierarchy. Cycles cut at 64 levels.
    */
  def hierarchy(name: UTF8String, key: Long): GenericArrayData = {
    val d = dict(name.toString)
    val parent = d.parentAttr.map(p => d.attrs(p)._2).getOrElse(
      throw new IllegalArgumentException(
        s"dictionary '$name' is not hierarchical"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var k = key
    var guard = 0
    var continue = true
    while (continue && guard < 64) {
      out += k
      parent.get(k) match {
        case Some(p: java.lang.Number) if p.longValue() != k =>
          k = p.longValue()
        case _ => continue = false
      }
      guard += 1
    }
    new GenericArrayData(out.toArray)
  }

  def isIn(name: UTF8String, child: Long, ancestor: Long): Boolean =
    hierarchy(name, child).toLongArray().contains(ancestor)
}
