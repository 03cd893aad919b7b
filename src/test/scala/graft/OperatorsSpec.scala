package graft

import graft.operators.{AsofJoin, Dedup}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Num.lsum2 equals dsum2 bit-for-bit on real money columns") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val r = li.groupBy($"l_returnflag").agg(
        (Num.lsum2($"l_quantity") - Num.dsum2($"l_quantity")).as("d1"),
        (Num.lsum2($"l_extendedprice") - Num.dsum2($"l_extendedprice")).as("d2"),
        (Num.lsum2($"l_discount") - Num.dsum2($"l_discount")).as("d3"))
      .agg(max(abs($"d1")) + max(abs($"d2")) + max(abs($"d3"))).collect()(0).getDouble(0)
    assert(r === 0.0)
  }

  test("Quantiles.percentiles matches builtin exact percentile on random data") {
    import graft.operators.Quantiles
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(_ =>
      (rnd.nextInt(3), math.round(rnd.nextDouble() * 1000) / 10.0)).toDF("g", "v")
      .repartition(8)
    val mine = Quantiles.percentiles(df, "g", "v",
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90"))
      .orderBy($"g").collect()
    val builtin = df.groupBy($"g")
      .agg(expr("percentile(v, 0.25)").as("p25"), expr("percentile(v, 0.5)").as("p50"),
           expr("percentile(v, 0.9)").as("p90"))
      .orderBy($"g").collect()
    mine.zip(builtin).foreach { case (a, b) =>
      (1 to 3).foreach { i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9,
          s"group ${a.getInt(0)} col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("Quantiles.percentilesSelect (two-phase) matches builtin exact percentile") {
    import graft.operators.Quantiles
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val df = (1 to 4000).map(_ =>
      (rnd.nextInt(3), rnd.nextDouble() * 5000)).toDF("g", "v").repartition(8)
    val mine = Quantiles.percentilesSelect(df, "g", "v", bucketWidth = 250.0,
        Seq(0.1 -> "p10", 0.5 -> "p50", 0.99 -> "p99"))
      .orderBy($"g").collect()
    val builtin = df.groupBy($"g")
      .agg(expr("percentile(v, 0.1)").as("p10"), expr("percentile(v, 0.5)").as("p50"),
           expr("percentile(v, 0.99)").as("p99"))
      .orderBy($"g").collect()
    mine.zip(builtin).foreach { case (a, b) =>
      (1 to 3).foreach { i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9,
          s"group ${a.getInt(0)} col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("Quantiles.percentilesExactWeighted: smallest value reaching p of total weight") {
    import graft.operators.Quantiles
    val df = Seq((1, 1.0, 1L), (1, 2.0, 3L), (1, 3.0, 6L), (2, 5.0, 2L), (2, 7.0, 2L))
      .toDF("g", "v", "w")
    val r = Quantiles.percentilesExactWeighted(df, "g", "v", "w",
        Seq(0.1 -> "p10", 0.4 -> "p40", 0.5 -> "p50"))
      .orderBy($"g").collect()
    // g=1: cum 1->1, 2->4, 3->10 of 10: p10 target 1 -> 1.0; p40 target 4 -> 2.0; p50 -> 3.0
    assert((r(0).getDouble(1), r(0).getDouble(2), r(0).getDouble(3)) === ((1.0, 2.0, 3.0)))
    // g=2: cum 5->2, 7->4 of 4: p10 target .4 -> 5.0; p40 1.6 -> 5.0; p50 2.0 -> 5.0
    assert((r(1).getDouble(1), r(1).getDouble(2), r(1).getDouble(3)) === ((5.0, 5.0, 5.0)))
  }

  test("Quantiles.percentilesExactWeighted rejects fractional weights loudly") {
    import graft.operators.Quantiles
    val df = Seq((1, 1.0, 0.9), (1, 2.0, 1.1)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Quantiles.percentilesExactWeighted(df, "g", "v", "w", Seq(0.5 -> "p50")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("fractional weight")))
    // integer-valued doubles still work (parquet often types counts as double)
    val ok = Seq((1, 1.0, 1.0), (1, 2.0, 3.0)).toDF("g", "v", "w")
    val r = Quantiles.percentilesExactWeighted(ok, "g", "v", "w", Seq(0.5 -> "p50"))
      .collect()(0)
    assert(r.getDouble(1) === 2.0)
  }

  test("Quantiles.percentilesSelect survives one pathologically hot bucket") {
    import graft.operators.Quantiles
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(37)
    // 95% of rows land in bucket [0, 10): with the old driver-side pass 2
    // this bucket's distinct values were collect()ed; now they must stay
    // on executors and the answer must still be exact.
    val df = (1 to 6000).map { _ =>
      val v = if (rnd.nextDouble() < 0.95) rnd.nextDouble() * 10 else rnd.nextDouble() * 5000
      (rnd.nextInt(2), v)
    }.toDF("g", "v").repartition(8)
    val mine = Quantiles.percentilesSelect(df, "g", "v", bucketWidth = 10.0,
        Seq(0.5 -> "p50", 0.97 -> "p97"))
      .orderBy($"g").collect()
    val builtin = df.groupBy($"g")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.97)").as("p97"))
      .orderBy($"g").collect()
    mine.zip(builtin).foreach { case (a, b) =>
      (1 to 2).foreach { i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9,
          s"group ${a.getInt(0)} col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("Quantiles.percentilesSelect: needs derivation stays distributed at 1e5 groups") {
    import graft.operators.Quantiles
    import org.apache.spark.sql.functions._
    // 100k groups × 3 rows: with the old driver-side needs derivation this
    // collect()ed groups × buckets metadata rows; now the needs table is
    // derived on executors and only the final 100k-row answer materializes.
    val rnd = new scala.util.Random(41)
    val df = (1 to 300000).map { i => (i % 100000, rnd.nextDouble() * 1000) }
      .toDF("g", "v").repartition(16)
    val mine = Quantiles.percentilesSelect(df, "g", "v", bucketWidth = 100.0,
      Seq(0.5 -> "p50"))
    val builtin = df.groupBy($"g").agg(expr("percentile(v, 0.5)").as("e50"))
    assert(mine.count() === 100000L)
    assert(mine.join(builtin, "g").filter(abs($"p50" - $"e50") > 1e-9).count() === 0L)
  }

  test("asof backward: latest right at-or-before left time, per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 40L, "a"), (1L, 100L, "b"), (1L, 120L, "c"), (3L, 5L, "x"))
      .toDF("rk", "rt", "tag")
    val res = AsofJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rt", "tag"))
      .select($"name", $"asof_rt", $"asof_tag").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(res("p1") === (Some(100L), Some("b"))) // non-strict: equal ts matches
    assert(res("p2") === (Some(40L), Some("a")))
    assert(res("p3") === (None, None)) // key with no right rows → nulls
  }

  test("dedup exactKeepFirst keeps lowest id per content") {
    val df = Seq((5L, "aaa"), (2L, "aaa"), (3L, "bbb"), (9L, "aaa"))
      .toDF("id", "text")
    val kept = Dedup.exactKeepFirst(df, "text", "id")
      .select($"id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
  }

  test("jaccardPairs finds the near-identical pair only") {
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f"),   // jaccard with 1: 4/6 = 0.667
      (3L, "x y z w v")
    ).toDF("id", "text")
    val pairs = Dedup.jaccardPairs(df, "text", "id", 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 1L && pairs(0).getLong(1) === 2L)
    assert(math.abs(pairs(0).getDouble(2) - 4.0 / 6.0) < 1e-5)
  }

  test("jaccardPairs matches brute force on a random corpus") {
    val rnd = new scala.util.Random(41)
    val vocab = (1 to 30).map(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      id -> rnd.shuffle(vocab).take(6 + rnd.nextInt(6)).toSet
    }
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "text")
    val got = Dedup.jaccardPairs(df, "text", "id", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = ta.intersect(tb).size.toDouble / ta.union(tb).size
      if j >= 0.4
    } yield (ia, ib)).toSet
    assert(got === want)
  }

  test("prefix filter keeps a universal stopword out of the candidate join") {
    // 200 docs, every one contains "the"; pairwise otherwise disjoint.
    // A naive inverted-index self-join would emit 200*199/2 = 19900 pairs
    // from the "the" bucket alone; the df-ordered prefix excludes it, so
    // the candidate set must be empty (no pair can reach J >= 0.5).
    val df = (1L to 200L).map(i => (i, s"the u${i}a u${i}b u${i}c u${i}d"))
      .toDF("id", "text")
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.functions.{array_distinct, col, explode, xxhash64}
    val toks = df.select(col("id"),
        explode(array_distinct(tokens(col("text")))).as("tok_s"))
      .select(col("id"), xxhash64(col("tok_s")).as("tok"))
    assert(Dedup.prefixCandidates(toks, 0.5).count() === 0L)
    assert(Dedup.jaccardPairs(df, "text", "id", 0.5).count() === 0L)
  }

  test("AllPairs.guarded passes small inputs and refuses oversized ones") {
    import graft.operators.AllPairs
    assert(AllPairs.guarded(spark.range(10).toDF("id"), maxRows = 100).count() === 10)
    intercept[IllegalArgumentException] {
      AllPairs.guarded(spark.range(200).toDF("id"), maxRows = 100)
    }
  }

  test("minhash LSH surfaces true near-duplicates") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "text")
    val cands = Dedup.minhashCandidates(df, "text", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)))
  }

  test("minhash LSH recall vs exact shingle-Jaccard on the sf0.001 corpus") {
    // Quality gate in the LSH's own similarity space: ground truth is the
    // EXACT 3-shingle-set Jaccard (the quantity minhash estimates — token
    // -set Jaccard would be the wrong space: this corpus shares most
    // vocabulary while shingles encode order). 16 hashes / 4 bands
    // collide w.p. 1-(1-J^4)^4 ≈ 0.95 at J=0.85, so recall over the
    // J>=0.85 pairs must stay high.
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sh = docs
      .select(col("doc_id").as("id"), expr(
        """array_distinct(transform(
          |  sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin).as("shs"))
      .filter(size(col("shs")) > 0)
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.shs"), col("b.shs"))).cast("double") /
          size(array_union(col("a.shs"), col("b.shs")))).as("j"))
      .filter(col("j") >= 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-duplicate docs")
    val found = truth.count(cands.contains)
    assert(found.toDouble / truth.size >= 0.75,
      s"LSH found $found of ${truth.size} true near-dup pairs")
  }

  test("runningDifference / neighbor follow the explicit ordering") {
    import graft.operators.RowOrder
    val df = Seq((1L, 1, 10.0, "a"), (1L, 2, 13.0, "b"), (1L, 3, 12.0, "c"),
                 (2L, 1, 5.0, "x"))
      .toDF("k", "seq", "v", "s")
    val part = Seq(col("k"))
    val ord = Seq(col("seq"))
    val r = df.select(col("k"), col("seq"),
        RowOrder.runningDifference(col("v"), part, ord).as("d"),
        RowOrder.neighbor(col("s"), 1, lit("END"), part, ord).as("nxt"),
        RowOrder.neighbor(col("s"), -2, lit("none"), part, ord).as("prev2"))
      .orderBy(col("k"), col("seq"))
      .collect()
    assert(r.map(_.getDouble(2)).toSeq === Seq(0.0, 3.0, -1.0, 0.0))
    assert(r.map(_.getString(3)).toSeq === Seq("b", "c", "END", "END"))
    assert(r.map(_.getString(4)).toSeq === Seq("none", "none", "a", "none"))
    // both neighbors + the difference plan into a single Window node
    val plan = df.select(
        RowOrder.runningDifference(col("v"), part, ord),
        RowOrder.neighbor(col("s"), 1, lit("END"), part, ord))
      .queryExecution.optimizedPlan
    val nWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(nWindows === 1, s"expected one shared Window node, got $nWindows")
  }

  test("connectedComponents: chain merges to one label, forest stays split") {
    // Chain 1-2-3-4-5 (diameter 4 — worst case for label propagation),
    // separate pair 10-11, shuffled across partitions.
    val pairs = Seq((2L, 3L), (10L, 11L), (1L, 2L), (4L, 5L), (3L, 4L))
      .toDF("id_a", "id_b").repartition(4)
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) === 1L))
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(cc.size === 7)
  }

  test("simhash candidates collide for near-identical token sets") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (200 to 260).map(i => s"q$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "text")
    val cands = Dedup.simhashCandidates(df, "text", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }

  test("runningConcurrency: sweep counts, pop-before-push tie rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // intervals (begin, end) on an integer timeline:
    //   [1,5) [2,4) [4,6) [6,7)
    // at t=1: 1 open; t=2: 2; t=4: [2,4) just closed, [4,6) opens → 2;
    // t=6: [1,5) and [4,6) closed → 1 (end==begin is NOT concurrent)
    val iv = Seq((1, 5), (2, 4), (4, 6), (6, 7)).toDF("b", "e")
    val got = graft.operators.RowOrder
      .runningConcurrency(iv, col("b"), col("e"))
      .orderBy(col("t")).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((1, 1L), (2, 2L), (4, 2L), (6, 1L)))
    // simultaneous begins all count at their shared instant
    val sim = Seq((1, 3), (1, 4), (2, 5)).toDF("b", "e")
    val got2 = graft.operators.RowOrder
      .runningConcurrency(sim, col("b"), col("e"))
      .orderBy(col("t")).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got2 === Seq((1, 2L), (2, 3L)))
  }
}
