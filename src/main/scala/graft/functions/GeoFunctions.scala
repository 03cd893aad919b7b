package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Geohash encode/decode (reference src/Functions/GeoHash.cpp,
  * geohashEncode/geohashDecode): standard base-32 bit-interleaved
  * subdivision. Pure deterministic per-row scalar functions — Scala UDFs
  * (not hot-path; the candidate-cell join key is the hash string, whose
  * cost is dwarfed by the join it feeds).
  */
object GeoFunctions {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lat: Double, lon: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid } else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid } else { ch = ch * 2; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode to the cell-center (lat, lon). */
  def decode(h: String): (Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var even = true
    h.foreach { c =>
      val ch = Base32.indexOf(c)
      var b = 4
      while (b >= 0) {
        val bitSet = ((ch >> b) & 1) == 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bitSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bitSet) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  private val encodeUdf = udf(encode _)
  private val decodeLatUdf = udf((h: String) => decode(h)._1)
  private val decodeLonUdf = udf((h: String) => decode(h)._2)

  def geohashEncode(lat: Column, lon: Column, precision: Column): Column =
    encodeUdf(lat, lon, precision)
  def geohashDecodeLat(h: Column): Column = decodeLatUdf(h)
  def geohashDecodeLon(h: Column): Column = decodeLonUdf(h)
}
