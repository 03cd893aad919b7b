package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** groupArraySample's seeded reservoir, ported exactly (reference
  * /root/reference/src/AggregateFunctions/AggregateFunctionGroupArray.h:
  * GroupArraySamplerData + the Sampler::RNG add path at :184, and
  * /root/reference/base/pcg-random/pcg_random.hpp pcg32_fast =
  * mcg_xsh_rs_64_32 — seed | 3, LCG multiplier 6364136223846793005, no
  * increment, XSH-RS output on the PRE-advance state).
  *
  * The RNG path depends only on the insert COUNT, never on values, so
  * this helper returns the surviving element INDICES (1-based) per
  * reservoir slot; the expression side maps them onto the collected
  * array. Insert order = collected order (Range partitions are ordered),
  * matching the reference's single-state sequential inserts.
  */
object ReservoirSample {

  private final class Pcg32Fast(seed: Long) {
    private var state: Long = seed | 3L
    def next(): Long = { // UInt32 result
      val internal0 = state
      state = state * 6364136223846793005L
      val rshift = ((internal0 >>> 61) & 7L).toInt
      val internal = internal0 ^ (internal0 >>> 22)
      (internal >>> (22 + rshift)) & 0xFFFFFFFFL
    }
    // genRandom(lim) for lim <= UInt32 max (always true here)
    def genRandom(lim: Long): Long = next() % (lim & 0xFFFFFFFFL)
  }

  /** Surviving 1-based indices per slot after n sequential inserts into
    * a k-slot seeded reservoir.
    */
  def indices(n: Int, k: Int, seed: Long): ArrayData = {
    val rng = new Pcg32Fast(seed)
    val slots = new Array[Int](math.min(math.max(n, 0), k))
    var total = 0
    var i = 1
    while (i <= n) {
      total += 1
      if (total <= k) slots(total - 1) = i
      else {
        val rnd = rng.genRandom(total.toLong)
        if (rnd < k) slots(rnd.toInt) = i
      }
      i += 1
    }
    new GenericArrayData(slots.map(x => x: Any))
  }
}
