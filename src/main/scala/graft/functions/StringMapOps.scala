package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.unsafe.types.UTF8String

/** str_to_map (reference src/Functions/map.cpp FunctionStrToMap:
  * 1073-1176): single-CHARACTER delimiters (only the first byte of each
  * delimiter argument counts), literal — not regex — matching, and the
  * exact parse loop: key up to the key-value delimiter, skip spaces,
  * value up to the ITEM delimiter, skip spaces, repeat; missing
  * delimiters yield '' fields, an empty input yields an empty map, and
  * non-const NULL inputs read as ''. Spark's builtin str_to_map treats
  * both delimiters as regexes and NULLs missing values — different
  * semantics on every edge.
  */
object StringMapOps {

  def strToMap(str: UTF8String, itemDelim: UTF8String,
      kvDelim: UTF8String): MapData = {
    val keys = new ArrayBuffer[Any]
    val values = new ArrayBuffer[Any]
    if (str != null && itemDelim != null && kvDelim != null) {
      val s = str.getBytes
      val item = itemDelim.getBytes.head
      val kv = kvDelim.getBytes.head
      val n = s.length
      var i = 0
      def parseTo(delim: Byte): UTF8String = {
        val begin = i
        while (i < n && s(i) != delim) i += 1
        val out = UTF8String.fromBytes(s, begin, i - begin)
        if (i < n && s(i) == delim) i += 1 // skip delimiter
        out
      }
      def skipSpace(): Unit = while (i < n && s(i) == ' ') i += 1
      while (i < n) {
        keys += parseTo(kv)
        skipSpace()
        values += parseTo(item)
        skipSpace()
      }
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(values.toArray))
  }
}
