package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers for the coding spellings (reference src/Functions/CRC
  * .cpp, FunctionsCodingUUID.cpp, FunctionsBinaryRepresentation.cpp) —
  * StaticInvoke scalars inside whole-stage codegen.
  */
object CodingOps {

  // CRC.cpp:42-48 — CRC64/ECMA and the IEEE-polynomial CRC32 variant
  // both start from 0 with no final xor (CRC32 itself is the standard
  // zlib form, init 0xffffffff, covered by Spark's crc32 builtin).
  private lazy val crc64Table: Array[Long] = {
    val poly = 0xc96c5795d7870f42L
    Array.tabulate(256) { i =>
      var c = i.toLong
      (0 until 8).foreach { _ =>
        c = if ((c & 1L) != 0) poly ^ (c >>> 1) else c >>> 1
      }
      c
    }
  }

  private lazy val crc32IeeeTable: Array[Int] = {
    val poly = 0xedb88320
    Array.tabulate(256) { i =>
      var c = i
      (0 until 8).foreach { _ =>
        c = if ((c & 1) != 0) poly ^ (c >>> 1) else c >>> 1
      }
      c
    }
  }

  def crc64(s: UTF8String): Long = {
    if (s == null) return 0L
    var crc = 0L
    s.getBytes.foreach { b =>
      crc = crc64Table(((crc ^ b) & 0xff).toInt) ^ (crc >>> 8)
    }
    crc
  }

  def crc32ieee(s: UTF8String): Long = {
    if (s == null) return 0L
    var crc = 0
    s.getBytes.foreach { b =>
      crc = crc32IeeeTable((crc ^ b) & 0xff) ^ (crc >>> 8)
    }
    crc.toLong & 0xffffffffL
  }

  /** UUIDStringToNum (FunctionsCodingUUID.cpp:226): the 16 raw bytes of
    * the hex digits; variant 2 swaps to the Microsoft mixed-endian
    * layout (first three groups little-endian). UUIDNumToString is the
    * inverse.
    */
  def uuidStringToNum(s: UTF8String, variant: Int): Array[Byte] = {
    if (s == null) return null
    val hex = s.toString.replace("-", "")
    require(hex.length == 32, s"UUIDStringToNum: malformed UUID '$s'")
    val bytes = Array.tabulate(16)(i =>
      Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
    if (variant == 2) msSwap(bytes) else bytes
  }

  def uuidNumToString(bytes: Array[Byte], variant: Int): UTF8String = {
    if (bytes == null) return null
    require(bytes.length == 16, "UUIDNumToString: need exactly 16 bytes")
    val b = if (variant == 2) msSwap(bytes) else bytes
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    UTF8String.fromString(
      s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
        s"${hex.substring(16, 20)}-${hex.substring(20)}")
  }

  private def msSwap(in: Array[Byte]): Array[Byte] = {
    val out = in.clone()
    val order = Seq(3, 2, 1, 0, 5, 4, 7, 6)
    order.zipWithIndex.foreach { case (src, dst) => out(dst) = in(src) }
    out
  }

  def uuidToUInt64High(s: UTF8String): Long = {
    val hex = s.toString.replace("-", "")
    java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
  }

  def uuidToUInt64Low(s: UTF8String): Long = {
    val hex = s.toString.replace("-", "")
    java.lang.Long.parseUnsignedLong(hex.substring(16), 16)
  }

  /** unbin (FunctionsBinaryRepresentation.cpp): '01100001…' → the bytes,
    * left-padded to whole bytes like the reference.
    */
  def unbin(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val pad = (8 - str.length % 8) % 8
    val full = "0" * pad + str
    val bytes = full.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    UTF8String.fromBytes(bytes)
  }

  /** FQDN() (reference FunctionFQDN.cpp) — the host's canonical name;
    * inherently environment-dependent, gated by a non-empty check only.
    */
  def fqdn(): UTF8String =
    UTF8String.fromString(java.net.InetAddress.getLocalHost.getCanonicalHostName)
}
