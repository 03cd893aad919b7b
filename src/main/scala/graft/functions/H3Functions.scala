package graft.functions

/** H3 hierarchical hex-grid index functions (reference
  * src/Functions/h3ToParent.cpp, h3ToChildren.cpp, h3GetBaseCell.cpp,
  * h3HexAreaM2.cpp, h3IndexesAreNeighbors.cpp, h3ToString.cpp,
  * stringToH3.cpp). Implemented from the PUBLIC H3 index specification
  * (bit layout: 4 resolution bits at 52, 7 base-cell bits at 45,
  * fifteen 3-bit per-resolution digits; aperture-7 IJK coordinate
  * math), not from any library source. Pure bit/integer math —
  * validated against the reference corpus goldens (01070_h3_*).
  */
object H3Functions {

  @inline def resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt
  @inline def baseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt
  @inline private def digit(h: Long, r: Int): Int =
    ((h >>> ((15 - r) * 3)) & 0x7L).toInt
  @inline private def setRes(h: Long, r: Int): Long =
    (h & ~(0xFL << 52)) | (r.toLong << 52)
  @inline private def setDigit(h: Long, r: Int, d: Int): Long = {
    val sh = (15 - r) * 3
    (h & ~(0x7L << sh)) | (d.toLong << sh)
  }

  /** The 12 pentagonal res-0 base cells (H3 spec). */
  private val PentagonBases =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  private def isPentagon(h: Long): Boolean =
    PentagonBases.contains(baseCell(h)) &&
      (1 to resolution(h)).forall(digit(h, _) == 0)

  /** Coarsen to `parentRes`: set the resolution field and pad the
    * finer digits with 7 (the spec's unused-digit marker). */
  def toParent(h: Long, parentRes: Int): Long = {
    require(parentRes >= 0 && parentRes <= resolution(h),
      s"h3ToParent: resolution $parentRes out of range")
    var out = setRes(h, parentRes)
    var r = parentRes + 1
    while (r <= 15) { out = setDigit(out, r, 7); r += 1 }
    out
  }

  /** All children at `childRes` (empty when coarser than `h`);
    * pentagons skip the deleted K-axis subsequence (digit 1). */
  def toChildren(h: Long, childRes: Int): Array[Long] = {
    val r0 = resolution(h)
    if (childRes < r0) return Array.empty
    require(childRes <= 15, s"h3ToChildren: resolution $childRes > 15")
    var cells = Array(setRes(h, childRes))
    var rr = r0 + 1
    while (rr <= childRes) {
      val next = Array.newBuilder[Long]
      cells.foreach { c =>
        // pentagon-ness of the PREFIX above this digit decides the skip
        val pent = isPentagon(toParent(c, rr - 1))
        var d = 0
        while (d < 7) {
          if (!(pent && d == 1)) next += setDigit(c, rr, d)
          d += 1
        }
      }
      cells = next.result()
      rr += 1
    }
    cells
  }

  /** Average hexagon area in m² per resolution (published H3 v3
    * `hexAreaM2` table — the reference returns these exact values). */
  private val HexAreaM2 = Array(
    4.250546848e12, 6.072209782e11, 8.674585403e10, 1.239226486e10,
    1.770323552e9, 2.529033645e8, 3.61290521e7, 5161293.2, 737327.6,
    105332.5, 15047.5, 2149.6, 307.1, 43.9, 6.3, 0.9)

  def hexAreaM2(res: Int): Double = {
    require(res >= 0 && res <= 15, s"h3HexAreaM2: resolution $res out of range")
    HexAreaM2(res)
  }

  // ---- aperture-7 IJK coordinate math (H3 spec appendix) ----

  private def normalize(v: Array[Int]): Array[Int] = {
    var i = v(0); var j = v(1); var k = v(2)
    if (i < 0) { j -= i; k -= i; i = 0 }
    if (j < 0) { i -= j; k -= j; j = 0 }
    if (k < 0) { i -= k; j -= k; k = 0 }
    val m = math.min(i, math.min(j, k))
    Array(i - m, j - m, k - m)
  }

  // digit → IJK unit vector: CENTER K J JK I IK IJ
  private val Unit = Array(
    Array(0, 0, 0), Array(0, 0, 1), Array(0, 1, 0), Array(0, 1, 1),
    Array(1, 0, 0), Array(1, 0, 1), Array(1, 1, 0))

  // scale a parent-res IJK into the next finer aperture-7 grid;
  // Class III (odd) resolutions rotate ccw, Class II cw
  private def downAp7(c: Array[Int]): Array[Int] = normalize(Array(
    3 * c(0) + c(1), 3 * c(1) + c(2), c(0) + 3 * c(2)))
  private def downAp7r(c: Array[Int]): Array[Int] = normalize(Array(
    3 * c(0) + c(2), c(0) + 3 * c(1), c(1) + 3 * c(2)))

  /** IJK of `h` within its own base cell's coordinate frame. */
  private def toIjk(h: Long): Array[Int] = {
    var c = Array(0, 0, 0)
    var r = 1
    val res = resolution(h)
    while (r <= res) {
      c = if (r % 2 == 1) downAp7(c) else downAp7r(c)
      val u = Unit(digit(h, r))
      c = normalize(Array(c(0) + u(0), c(1) + u(1), c(2) + u(2)))
      r += 1
    }
    c
  }

  /** Hex-grid distance on the same base cell. */
  private def ijkDistance(a: Array[Int], b: Array[Int]): Int = {
    val d = normalize(Array(a(0) - b(0), a(1) - b(1), a(2) - b(2)))
    math.max(math.abs(d(0)), math.max(math.abs(d(1)), math.abs(d(2))))
  }

  /** 1 when the two cells share an edge. Exact for cells on the same
    * base cell (the reference corpus's coverage); cross-base-cell
    * adjacency needs the 122-entry base-cell neighbor table, which we
    * deliberately do not model — such pairs raise rather than guess. */
  def indexesAreNeighbors(a: Long, b: Long): Int = {
    if (a == b || resolution(a) != resolution(b)) return 0
    if (baseCell(a) != baseCell(b))
      throw new UnsupportedOperationException(
        "h3IndexesAreNeighbors: cross-base-cell pairs are unsupported")
    if (ijkDistance(toIjk(a), toIjk(b)) == 1) 1 else 0
  }

  /** Average hexagon edge length in m per resolution (published H3 v3
    * `edgeLengthM` table). */
  private val EdgeLengthM = Array(
    1107712.591, 418676.0055, 158244.6558, 59810.85794, 22606.3794,
    8544.408276, 3229.482772, 1220.629759, 461.3546837, 174.3756681,
    65.90780749, 24.9108114, 9.415526211, 3.559893033, 1.348574562,
    0.509713273)

  def edgeLengthM(res: Int): Double = {
    require(res >= 0 && res <= 15, s"h3EdgeLengthM: resolution $res out of range")
    EdgeLengthM(res)
  }

  /** Average hex edge as degrees of arc on the mean earth radius. */
  def edgeAngle(res: Int): Double =
    math.toDegrees(edgeLengthM(res) / 6371007.180918475)

  /** Structural validity per the index spec: cell mode, zero reserved
    * bits, base cell < 122, digits ≤6 through the resolution and
    * exactly 7 beyond it, and no K-axis first digit under a pentagon. */
  def isValid(h: Long): Int = {
    if (h < 0) return 0                        // high bit set
    if (((h >>> 59) & 0xF) != 1) return 0      // mode must be cell
    if (((h >>> 56) & 0x7) != 0) return 0      // reserved bits
    val bc = baseCell(h)
    if (bc >= 122) return 0
    val res = resolution(h)
    var firstNonZero = 0
    var r = 1
    while (r <= 15) {
      val d = digit(h, r)
      if (r <= res) {
        if (d == 7) return 0
        if (firstNonZero == 0 && d != 0) firstNonZero = d
      } else if (d != 7) return 0
      r += 1
    }
    if (PentagonBases.contains(bc) && firstNonZero == 1) return 0
    1
  }

  def toHexString(h: Long): String = java.lang.Long.toHexString(h)

  def fromHexString(s: String): Long =
    java.lang.Long.parseUnsignedLong(s.trim, 16)

  // ---- kRing: aperture-7 disk enumeration (reference h3kRing.cpp over
  // the public H3 kRing algorithm). The IJK walk is exact WITHIN a base
  // cell; a ring that would cross into a neighboring base cell needs
  // the H3 122-entry base-cell neighbor table, which we deliberately do
  // not model — such rings raise rather than guess (same refusal
  // contract as indexesAreNeighbors).

  // inverse of downAp7/downAp7r: coarsen one aperture-7 level
  // (H3 spec _upAp7/_upAp7r — lround of the fractional axial coords)
  private def upAp7(c: Array[Int]): Array[Int] = {
    val i = c(0) - c(2); val j = c(1) - c(2)
    normalize(Array(
      math.round((3 * i - j) / 7.0).toInt,
      math.round((i + 2 * j) / 7.0).toInt, 0))
  }
  private def upAp7r(c: Array[Int]): Array[Int] = {
    val i = c(0) - c(2); val j = c(1) - c(2)
    normalize(Array(
      math.round((2 * i + j) / 7.0).toInt,
      math.round((3 * j - i) / 7.0).toInt, 0))
  }

  private def unitToDigit(u: Array[Int]): Int = {
    var d = 0
    while (d < 7) {
      if (Unit(d)(0) == u(0) && Unit(d)(1) == u(1) && Unit(d)(2) == u(2))
        return d
      d += 1
    }
    -1
  }

  /** Rebuild an H3 index from a base-cell-frame IJK, or None when the
    * coordinate escapes the base cell. */
  private def fromIjk(center: Long, c0: Array[Int]): Option[Long] = {
    val res = resolution(center)
    var cur = c0
    val digits = new Array[Int](res + 1)
    var r = res
    while (r >= 1) {
      val last = cur
      cur = if (r % 2 == 1) upAp7(last) else upAp7r(last)
      val down = if (r % 2 == 1) downAp7(cur) else downAp7r(cur)
      val diff = normalize(Array(
        last(0) - down(0), last(1) - down(1), last(2) - down(2)))
      val d = unitToDigit(diff)
      if (d < 0) return None
      digits(r) = d
      r -= 1
    }
    if (cur(0) != 0 || cur(1) != 0 || cur(2) != 0) return None
    var h = center
    r = 1
    while (r <= res) { h = setDigit(h, r, digits(r)); r += 1 }
    Some(h)
  }

  /** All cells within hex-grid distance k, unordered (the corpus sorts).
    * k is capped like the reference (error 12 analog) and pentagons /
    * cross-base-cell rings refuse honestly. */
  def kRing(h: Long, k: Int): Array[Long] = {
    if (k < 0 || k > 10000) throw new IllegalArgumentException(
      s"h3kRing: k = $k out of bounds (error 12 analog)")
    // res-0 ring saturation: the base-cell graph's diameter is well
    // under 60, so any larger k covers the whole globe — all 122 base
    // cells (01442's `length(h3kRing(x, 1000)) = 122`); smaller res-0
    // rings would need the base-cell neighbor table (refusal below)
    if (resolution(h) == 0) {
      if (k >= 60) return (0 until 122).map(b =>
        (1L << 59) | (b.toLong << 45) | ((1L << 45) - 1)).toArray
      if (k == 0) return Array(h)
      throw new UnsupportedOperationException(
        "h3kRing: partial res-0 rings need the base-cell neighbor table")
    }
    if (PentagonBases.contains(baseCell(h)))
      throw new UnsupportedOperationException(
        "h3kRing: pentagon base cells are unsupported")
    val center = toIjk(h)
    val out = Array.newBuilder[Long]
    var a = -k
    while (a <= k) {
      var b = -k
      while (b <= k) {
        val cand = normalize(Array(center(0) + a, center(1) + b, center(2)))
        if (ijkDistance(cand, center) <= k) {
          fromIjk(h, cand) match {
            case Some(idx) => out += idx
            case None => throw new UnsupportedOperationException(
              "h3kRing: ring crosses a base-cell boundary (the base-cell" +
                " neighbor table is not modeled)")
          }
        }
        b += 1
      }
      a += 1
    }
    out.result().distinct
  }
}
