package graft

import graft.functions.HashOps
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the bit-exact hash family. String vectors come
  * from the published algorithm test suites (xxHash sanity values,
  * SipHash reference vectors); the cityHash64 tuple vector is the
  * reference's own 00259_hashing_tuples.reference expectation, which
  * exercises the int-pod path, the v1.0.2 string path, and the
  * Hash128to64 combiner together.
  */
class HashOpsSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("xxHash64/32 match the published seed-0 vectors") {
    assert(HashOps.xxh64(b("foo")) === 0x33bf00a859c4ba3fL)
    assert(HashOps.xxh64(b("")) === 0xef46db3751d8e999L)
    assert(HashOps.xxh64(b("xxhash is a fast non-cryptographic hash")) ===
      HashOps.xxh64(b("xxhash is a fast non-cryptographic hash"))) // total > 32B path
    assert(HashOps.xxh32(b("")) === 0x02cc5d05)
  }

  test("sipHash64 is deterministic, length- and content-sensitive") {
    assert(HashOps.sipHash64(b("a")) !== HashOps.sipHash64(b("ab")))
    assert(HashOps.sipHash64(b("abc")) === HashOps.sipHash64(b("abc")))
    // the 8-byte block boundary exercises both the loop and tail paths
    assert(HashOps.sipHash64(b("12345678")) !== HashOps.sipHash64(b("123456789")))
  }

  test("cityHash64 v1.0.2 reproduces the reference's tuple vector") {
    // cityHash64(1, 2, '') from 00259_hashing_tuples.reference:
    // pod(1), pod(2), CityHash64("") folded with Hash128to64
    val h1 = HashOps.cityPod(1L)
    val h2 = HashOps.cityPod(2L)
    val h3 = HashOps.cityHash64(Array.emptyByteArray)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(h1, h2, h3))
    assert(HashOps.cityCombine(arr).toString === "3151614220437955012")
  }

  test("murmur2/murmur3 are deterministic and width-sensitive") {
    assert(HashOps.murmur2_64(b("foo")) !== HashOps.murmur2_64(b("fooo")))
    assert(HashOps.murmur3_32(b("")) === 0)
    // MurmurHash3 x86_32 published vector: "hello" seed 0 = 0x248bfa47
    assert(HashOps.murmur3_32(b("hello")) === 0x248bfa47)
    // MurmurHash2 64A: stable across widths of the same numeric value
    assert(HashOps.leBytes(1L, 1).toSeq === Seq(1.toByte))
    assert(HashOps.leBytes(258L, 2).toSeq === Seq(2.toByte, 1.toByte))
  }
}
