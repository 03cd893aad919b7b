package graft

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-grams, and empty below k tokens") {
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("text", "id")
    val res = df.select($"id", T.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(res(1) === Seq("a b c", "b c d"))
    assert(res(2) === Seq.empty)
  }

  test("token stats and stopword ratio") {
    val df = Seq(("the cat and the dog", 1)).toDF("text", "id")
    val r = df.select(
      T.tokenCount($"text"),
      T.tokenOccurrences($"text", "the"),
      T.stopwordRatio($"text", Seq("the", "and"))).collect()(0)
    assert(r.getInt(0) === 5)
    assert(r.getInt(1) === 2)
    assert(math.abs(r.getDouble(2) - 0.6) < 1e-9)
  }

  test("minhash signature: identical texts agree, signature length fixed") {
    val df = Seq(("one two three four five", 1), ("one two three four five", 2))
      .toDF("text", "id")
    val sigs = df.select(T.minhashSignature($"text", 3, 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).length === 16)
    assert(sigs(0) === sigs(1))
  }

  test("langId picks the profile with most stopword hits") {
    val profiles = Map("en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
    val df = Seq(("der hund und die katze", 1), ("the cat and dog", 2), ("xyz abc", 3))
      .toDF("text", "id")
    val res = df.select($"id", T.langId($"text", profiles).as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(res(1) === "de")
    assert(res(2) === "en")
    assert(res(3) === "und")
  }

  test("vector dot/cosine in double precision") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(V.dot($"a", $"b"), V.norm($"a")).collect()(0)
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("native FloatDotProduct matches the higher-order-function form exactly") {
    val vecs = (1 to 200).map { i =>
      (Array.tabulate(64)(d => ((i * 31 + d * 7) % 100 - 50) / 50.0f),
       Array.tabulate(64)(d => ((i * 17 + d * 13) % 100 - 50) / 50.0f))
    }
    val df = vecs.toDF("a", "b")
    val diffs = df.select((V.dot($"a", $"b") - V.dotHof($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).collect()(0).getDouble(0)
    assert(diffs === 0.0) // bit-identical, not just close
  }

  test("hyperplane LSH bucket is deterministic and bounded") {
    val df = Seq((Array.fill(16)(0.1f), 1), (Array.fill(16)(0.1f), 2)).toDF("v", "id")
    val buckets = df.select(V.hyperplaneLshBucket($"v", 8)).as[Long].collect()
    assert(buckets(0) === buckets(1))
    assert(buckets(0) >= 0 && buckets(0) < 256)
  }

  test("native LSH bucket matches the higher-order-function form exactly") {
    val vecs = (0 until 40).map { i =>
      Array.tabulate(64)(d => ((i * 31 + d * 7) % 101 - 50) / 50.0f)
    }.map(Tuple1(_))
    val df = vecs.toDF("v")
    val n = df.select((V.hyperplaneLshBucket($"v", 8) -
        V.hyperplaneLshBucketHof($"v", 8)).as("d"))
      .filter($"d" =!= 0L).count()
    assert(n === 0)
  }

  test("native MinHashSignature: deterministic, fixed length, null below k") {
    import graft.functions.TextFunctions._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "completely different words here entirely now"),
      ("d", "too few")).toDF("id", "text")
    val sigs = df.select($"id", minhashSignatureNative(tokens($"text"), 3, 16).as("sig"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(sigs("a").get === sigs("b").get)          // identical text agrees
    assert(sigs("a").get.length === 16)
    assert(sigs("a").get !== sigs("c").get)          // different text differs
    assert(sigs("d").isEmpty)                        // < k tokens → null
  }

  test("geohash encode matches published vectors; decode roundtrips") {
    import graft.functions.GeoFunctions
    // canonical example from the geohash spec
    assert(GeoFunctions.encode(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(GeoFunctions.encode(42.605, -5.603, 5) === "ezs42")
    val (la, lo) = GeoFunctions.decode("u4pruydqqvj")
    assert(math.abs(la - 57.64911) < 1e-4 && math.abs(lo - 10.40744) < 1e-4)
    val df = Seq((48.8566, 2.3522)).toDF("lat", "lon")
    val gh = df.select(GeoFunctions.geohashEncode($"lat", $"lon", lit(7))).as[String].collect()(0)
    assert(gh === GeoFunctions.encode(48.8566, 2.3522, 7))
  }

  test("geohashesInBox enumerates the covering grid cells") {
    import graft.functions.GeoFunctions
    // a box inside one precision-3 cell still returns that cell
    val one = GeoFunctions.geohashesInBox(10.40, 57.64, 10.41, 57.65, 3)
    assert(one === Seq("u4p"))
    // growing the box adds neighbors; every point of the box is covered
    val cells = GeoFunctions.geohashesInBox(10.0, 57.0, 11.0, 58.0, 3)
    assert(cells.nonEmpty && cells.distinct.length === cells.length)
    assert(cells.contains(GeoFunctions.encode(57.5, 10.5, 3)))
    // all corners land in some returned cell
    Seq((57.0, 10.0), (58.0, 11.0), (57.0, 11.0), (58.0, 10.0)).foreach {
      case (la, lo) => assert(cells.contains(GeoFunctions.encode(la, lo, 3)))
    }
    // inverted and NaN boxes are empty
    assert(GeoFunctions.geohashesInBox(11.0, 57.0, 10.0, 58.0, 3).isEmpty)
    assert(GeoFunctions.geohashesInBox(Double.NaN, 0, 1, 1, 3).isEmpty)
  }

  test("multimodal stub: schema and shapes are real") {
    val docs = Seq((1L, "hello world media payload")).toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs, "doc_id", "text")
      .withColumn("features", Multimodal.fakeDecodeFeatures($"media", 4))
      .withColumn("frames", Multimodal.sampleFrames($"media", 2, 5))
    val row = m.select($"meta.n_bytes", size($"features"), size($"frames")).collect()(0)
    assert(row.getInt(0) === 25)
    assert(row.getInt(1) === 4)
    assert(row.getInt(2) === 2)
    val feats = m.select($"features").collect()(0).getSeq[Double](0)
    assert(feats.forall(f => f >= -1.0 && f <= 1.0))
  }

  test("multiProbeBuckets: exact bucket plus all Hamming<=r neighbors, no dupes") {
    import graft.functions.VectorFunctions.multiProbeBuckets
    val df = Seq(0b10110010L).toDF("b")
    val r2 = df.select(multiProbeBuckets($"b", 8, 2)).collect()(0).getSeq[Long](0)
    assert(r2.length === 1 + 8 + 28)
    assert(r2.distinct.length === r2.length)
    assert(r2.contains(0b10110010L))
    // every probe is within Hamming distance 2 of the original
    assert(r2.forall(k => java.lang.Long.bitCount(k ^ 0b10110010L) <= 2))
    val r1 = df.select(multiProbeBuckets($"b", 8, 1)).collect()(0).getSeq[Long](0)
    assert(r1.length === 9)
    val r0 = df.select(multiProbeBuckets($"b", 8, 0)).collect()(0).getSeq[Long](0)
    assert(r0 === Seq(0b10110010L))
  }
}
