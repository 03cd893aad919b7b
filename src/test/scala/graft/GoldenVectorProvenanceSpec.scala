package graft

/** Cross-validates the GOLDEN VECTOR oracles that the driver gate pins
  * as literal VALUES (geohash_cells, xirr_portfolio) against fully
  * INDEPENDENT implementations written from the published algorithms —
  * not the engine's code paths. The pins were captured from the engine's
  * own sf0.01 output; without this spec a divergence present at capture
  * time would be frozen in as "expected". Here the whole pinned pipeline
  * (input derivation → algorithm → aggregation → rounding) is replayed
  * in plain driver-side Scala over the same parquet inputs and compared
  * against the literal vectors parsed out of SparkEntry.oracleSql — so
  * the gate certifies published-algorithm parity, not merely "engine
  * still produces what it produced in round 10".
  */
class GoldenVectorProvenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pinnedRows(query: String): Seq[Array[String]] = {
    val sql = SparkEntry.oracleSql(query)
    val values = sql.substring(sql.indexOf("(VALUES") + 7,
      sql.indexOf(") AS t("))
    """\(([^()]*)\)""".r.findAllMatchIn(values)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("'").stripSuffix("'")))
      .toSeq
  }

  private def r6(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)

  // ---------------------------------------------------------------------
  // Independent geohash, written from the public spec (Niemeyer 2008):
  // interleave longitude/latitude range-halving bits, longitude first,
  // 5 bits per character of the base-32 alphabet (i,l,o excluded).
  // Deliberately structured differently from GeoFunctions (string
  // building via per-character bit loop, not bit-twiddled longs).
  // ---------------------------------------------------------------------
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def ghEncode(lat: Double, lon: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    val sb = new StringBuilder
    var idx = 0; var bit = 0
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { idx = idx * 2 + 1; lonLo = mid }
        else { idx = idx * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { idx = idx * 2 + 1; latLo = mid }
        else { idx = idx * 2; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(base32(idx)); bit = 0; idx = 0 }
    }
    sb.toString
  }

  /** Decode to the cell CENTER (the engine's geohashDecodeLat/Lon
    * contract). */
  private def ghDecode(gh: String): (Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    gh.foreach { c =>
      val idx = base32.indexOf(c)
      var b = 4
      while (b >= 0) {
        val on = ((idx >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (on) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (on) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  test("geohash_cells pinned vector matches an independent published-spec implementation") {
    val userIds = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct()
      .collect().map(_.getLong(0))
    // replay the query's coordinate synthesis exactly
    val rows = userIds.map { uid =>
      val lat = (uid * 37 % 17000).toDouble / 100.0 - 85.0
      val lon = (uid * 91 % 35000).toDouble / 100.0 - 175.0
      val gh = ghEncode(lat, lon, 6)
      val (dlat, dlon) = ghDecode(gh)
      (gh.substring(0, 4), math.abs(dlat - lat), math.abs(dlon - lon))
    }
    val computed = rows.groupBy(_._1).map { case (cell4, g) =>
      cell4 -> (g.length.toLong, r6(g.map(_._2).max), r6(g.map(_._3).max))
    }
    val pinned = pinnedRows("geohash_cells")
    assert(pinned.nonEmpty && pinned.size == computed.size,
      s"pinned ${pinned.size} cells, independent impl ${computed.size}")
    pinned.foreach { case Array(cell4, n, latErr, lonErr) =>
      val (cn, clat, clon) = computed.getOrElse(cell4,
        fail(s"pinned cell $cell4 missing from independent computation"))
      assert(cn == n.toLong, s"$cell4 n_users: pinned $n, independent $cn")
      assert(clat.compareTo(new java.math.BigDecimal(latErr)) == 0,
        s"$cell4 max_lat_err: pinned $latErr, independent $clat")
      assert(clon.compareTo(new java.math.BigDecimal(lonErr)) == 0,
        s"$cell4 max_lon_err: pinned $lonErr, independent $clon")
    }
  }

  // ---------------------------------------------------------------------
  // Independent IRR: bisection on the same NPV definition (flows
  // discounted at (1+r)^(days/365) from the first flow). The engine
  // solves by Newton with a heuristic initial guess — an agreeing root
  // from a different numerical method on independently-derived inputs
  // certifies the pinned values, not the solver.
  // ---------------------------------------------------------------------
  private def npv(flows: Seq[(Long, Double)], r: Double): Double = {
    val t0 = flows.head._1
    flows.map { case (t, v) => v / math.pow(1.0 + r, (t - t0) / 365.0) }.sum
  }

  private def bisectIrr(flows: Seq[(Long, Double)]): Double = {
    var lo = -0.9999; var hi = 100.0
    var flo = npv(flows, lo)
    val fhi = npv(flows, hi)
    assert(flo * fhi < 0, "bisection bracket must straddle the root")
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2
      val fm = npv(flows, mid)
      if (flo * fm <= 0) hi = mid else { lo = mid; flo = fm }
      i += 1
    }
    (lo + hi) / 2
  }

  test("xirr_portfolio pinned vector matches an independent bisection solver") {
    val cut = java.time.LocalDate.parse("1998-01-01")
    val epoch = java.time.LocalDate.parse("1995-01-01")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice")
      .collect().map { r =>
        val d = r.get(1) match {
          case ts: java.sql.Timestamp => ts.toLocalDateTime.toLocalDate
          case dt: java.sql.Date => dt.toLocalDate
          case ld: java.time.LocalDate => ld
        }
        val price = r.get(2) match {
          case bd: java.math.BigDecimal => bd.doubleValue
          case dbl: java.lang.Double => dbl.doubleValue
        }
        val flow = if (d.isBefore(cut)) -price else price * 1.8
        (r.getLong(0) % 20, java.time.temporal.ChronoUnit.DAYS.between(epoch, d), flow)
      }
    val byGroup = orders.groupBy(_._1)
    val pinned = pinnedRows("xirr_portfolio")
    assert(pinned.size == 20)
    pinned.foreach { case Array(g, irr) =>
      val flows = byGroup(g.toLong).toSeq
        .map(x => (x._2, x._3)).sortBy(x => (x._1, x._2))
      val root = bisectIrr(flows)
      assert(r6(root).compareTo(new java.math.BigDecimal(irr)) == 0,
        s"group $g: pinned $irr, independent bisection ${r6(root)} (raw $root)")
    }
  }
}
