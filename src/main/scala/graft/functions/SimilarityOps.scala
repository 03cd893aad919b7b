package graft.functions

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers for the string-similarity / version-compare /
  * base58 / bitmask spellings, invoked from Catalyst via StaticInvoke so
  * the call sits inside whole-stage codegen.
  *
  * ngram family (reference src/Functions/FunctionsStringSimilarity.cpp):
  * 4-gram multiset metric — needle gram multiset S (|S| = s), walk the
  * haystack grams decrementing d (initialized to s) on a hit and, for
  * the symmetric distance, incrementing on a miss, consuming S counts as
  * it goes (:230). ngramDistance = d / max(h+s, 1); ngramSearch =
  * 1 − d / max(s, 1); Float32 results like the reference. DELIBERATE
  * DIVERGENCE: the reference buckets grams into a 2^16 CRC hash space,
  * so its metric includes rare hash collisions; we compare exact grams.
  * Non-UTF8 variants gram over BYTES, UTF8 variants over codepoints;
  * case-insensitive lowers per byte (ASCII) / per codepoint (UTF8 — the
  * reference's bit-trick lowering differs on a few exotic codepoints).
  */
object SimilarityOps {

  private def byteGrams(s: Array[Byte], lower: Boolean): mutable.HashMap[Int, Int] = {
    val m = mutable.HashMap.empty[Int, Int]
    var i = 0
    while (i + 4 <= s.length) {
      var k = 0
      var j = 0
      while (j < 4) {
        var b = s(i + j).toInt & 0xff
        if (lower && b >= 'A' && b <= 'Z') b += 32
        k = (k << 8) | b
        j += 1
      }
      m.update(k, m.getOrElse(k, 0) + 1)
      i += 1
    }
    m
  }

  private def cpGrams(s: String, lower: Boolean): mutable.HashMap[String, Int] = {
    val cps = s.codePoints().toArray
    val lc = if (lower) cps.map(Character.toLowerCase) else cps
    val m = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + 4 <= lc.length) {
      m.update(new String(lc, i, 4), m.getOrElse(new String(lc, i, 4), 0) + 1)
      i += 1
    }
    m
  }

  private def metric[K](
      needle: mutable.HashMap[K, Int], hay: Iterator[K],
      symmetric: Boolean): (Long, Long, Long) = {
    val s = needle.values.map(_.toLong).sum
    var d = s
    var h = 0L
    hay.foreach { g =>
      val c = needle.getOrElse(g, 0)
      if (c > 0) d -= 1 else if (symmetric) d += 1
      needle.update(g, c - 1)
      h += 1
    }
    (d, h, s)
  }

  private def ngram(
      haystack: UTF8String, needle: UTF8String,
      utf8: Boolean, ci: Boolean, symmetric: Boolean): Float = {
    if (haystack == null || needle == null) return 0f
    val (d, h, s) =
      if (!utf8) {
        val ng = byteGrams(needle.getBytes, ci)
        val hb = haystack.getBytes
        val grams = (0 to hb.length - 4).iterator.map { i =>
          var k = 0
          var j = 0
          while (j < 4) {
            var b = hb(i + j).toInt & 0xff
            if (ci && b >= 'A' && b <= 'Z') b += 32
            k = (k << 8) | b
            j += 1
          }
          k
        }
        metric(ng, grams, symmetric)
      } else {
        val ng = cpGrams(needle.toString, ci)
        val cps = haystack.toString.codePoints().toArray
        val lc = if (ci) cps.map(Character.toLowerCase) else cps
        val grams = (0 to lc.length - 4).iterator.map(i => new String(lc, i, 4))
        metric(ng, grams, symmetric)
      }
    if (symmetric) d.toFloat / math.max(h + s, 1L)
    else 1f - d.toFloat / math.max(s, 1L)
  }

  def ngramDistance(h: UTF8String, n: UTF8String): Float = ngram(h, n, false, false, true)
  def ngramDistanceCI(h: UTF8String, n: UTF8String): Float = ngram(h, n, false, true, true)
  def ngramDistanceUTF8(h: UTF8String, n: UTF8String): Float = ngram(h, n, true, false, true)
  def ngramDistanceCIUTF8(h: UTF8String, n: UTF8String): Float = ngram(h, n, true, true, true)
  def ngramSearch(h: UTF8String, n: UTF8String): Float = ngram(h, n, false, false, false)
  def ngramSearchCI(h: UTF8String, n: UTF8String): Float = ngram(h, n, false, true, false)
  def ngramSearchUTF8(h: UTF8String, n: UTF8String): Float = ngram(h, n, true, false, false)
  def ngramSearchCIUTF8(h: UTF8String, n: UTF8String): Float = ngram(h, n, true, true, false)

  /** versionCompare / appVersionCompare (reference
    * FunctionAppVersionCompare.h:258): dot-split segments, leading
    * digits parsed per segment (trailing junk skipped to the next dot),
    * compared pairwise until unequal, then the op applied; exhausted
    * sides read the mode's default (0 for versionCompare; −2 for
    * appVersionCompare, with a trailing dot reading −1 once). App mode
    * returns false outright when exactly one side contains a dot.
    */
  def versionCompare(
      l: UTF8String, r: UTF8String, op: UTF8String,
      maxLength: Long, appMode: Boolean): Boolean = {
    if (l == null || r == null || op == null) return false
    val ls = l.toString
    val rs = r.toString
    if (appMode && ls.nonEmpty && rs.nonEmpty &&
        (ls.contains('.') ^ rs.contains('.'))) return false
    val default = if (appMode) -2 else 0

    def segments(v: String): Iterator[Int] = new Iterator[Int] {
      private var pos = 0
      private var emittedDot = false
      private val endsWithDot = appMode && v.nonEmpty && v.last == '.'
      private var emitted = 0L
      def hasNext: Boolean = emitted < maxLength &&
        (pos < v.length || (endsWithDot && !emittedDot && pos >= v.length))
      def next(): Int = {
        emitted += 1
        if (pos >= v.length) { emittedDot = true; return -1 }
        var res = 0
        var i = pos
        while (i < v.length && v.charAt(i).isDigit && v.charAt(i) != '.') {
          res = res * 10 + (v.charAt(i) - '0')
          i += 1
        }
        while (i < v.length && v.charAt(i) != '.') i += 1
        pos = if (i >= v.length) v.length else i + 1
        res
      }
    }

    val li = segments(ls)
    val ri = segments(rs)
    def apply(a: Int, b: Int): Boolean = op.toString match {
      case "" | "=" => a == b
      case "!=" => a != b
      case "<" => a < b
      case ">" => a > b
      case "<=" => a <= b
      case ">=" => a >= b
      case other => throw new IllegalArgumentException(
        s"versionCompare: unsupported op '$other'")
    }
    while (true) {
      val lHas = li.hasNext
      val rHas = ri.hasNext
      val a = if (lHas) li.next() else default
      val b = if (rHas) ri.next() else default
      if (a != b) return apply(a, b)
      if (!lHas && !rHas) return apply(default, default)
    }
    false
  }

  private val Base58Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  /** base58Encode/Decode (reference src/Functions/base58Encode.cpp
    * family): Bitcoin alphabet, leading zero bytes encode as '1'.
    */
  def base58Encode(in: UTF8String): UTF8String = {
    if (in == null) return null
    val bytes = in.getBytes
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    var num = BigInt(1, bytes)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(Base58Alphabet(r.toInt))
      num = q
    }
    (0 until zeros).foreach(_ => sb.append('1'))
    UTF8String.fromString(sb.reverse.toString)
  }

  def base58Decode(in: UTF8String): UTF8String = {
    if (in == null) return null
    val s = in.toString
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    var num = BigInt(0)
    s.foreach { c =>
      val idx = Base58Alphabet.indexOf(c)
      if (idx < 0) throw new IllegalArgumentException(
        s"base58Decode: invalid character '$c'")
      num = num * 58 + idx
    }
    val body = if (num == 0) Array.empty[Byte] else num.toByteArray.dropWhile(_ == 0)
    UTF8String.fromBytes(Array.fill[Byte](zeros)(0) ++ body)
  }

  /** bitmaskToList / bitmaskToArray (reference
    * src/Functions/FunctionsBitToArray.cpp): decompose into powers of
    * two, ascending.
    */
  private def bitmaskPowers(x: Long): Array[Long] = {
    val out = mutable.ArrayBuffer.empty[Long]
    var bit = 0
    while (bit < 64) {
      if ((x & (1L << bit)) != 0) out += (1L << bit)
      bit += 1
    }
    out.toArray
  }

  def bitmaskToList(x: Long): UTF8String =
    UTF8String.fromString(bitmaskPowers(x).mkString(","))

  def bitmaskToArray(x: Long): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bitmaskPowers(x))

  // --- ngram/wordShingle SimHash + MinHash family (reference
  // src/Functions/FunctionsStringHash.cpp): SimHash bit-votes each
  // shingle hash into a 64-bit fingerprint (SimHashImpl:155-169);
  // MinHash keeps the `hash_num` DISTINCT smallest and largest shingle
  // hashes and folds each set into one value (MinHashImpl:334-355),
  // returning the (min-side, max-side) pair. Defaults shingle_size=3,
  // hash_num=6. DELIBERATE DIVERGENCE: the reference hashes shingles
  // with CityHash-family `Hash::shingleHash` and combines with
  // Hash128to64; we use FNV-1a 64 and a 128-to-64-style fold — hash
  // VALUES differ, the algorithm and its collision/similarity structure
  // are the same (these hashes are only ever compared to each other).
  // Word shingles take maximal letter/digit runs of ≥ 4 bytes
  // (min_word_size, MinHashImpl:329); the reference's UTF8 separator
  // classification is approximated by Character.isLetterOrDigit. The
  // -Arg variants (returning the shingle strings) are not registered.

  private[graft] def fnv1a64(s: String, ci: Boolean): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val c = if (ci) Character.toLowerCase(s.charAt(i)) else s.charAt(i)
      h ^= c.toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def mix128to64(a: Long, b: Long): Long = {
    // 128→64 fold in the spirit of Hash128to64: multiply-xor-shift mix.
    val kMul = 0x9ddfea08eb382d69L
    var x = (a ^ b) * kMul
    x ^= (x >>> 47)
    x = (b ^ x) * kMul
    x ^= (x >>> 47)
    x * kMul
  }

  private def shingleStream(s: String, n: Int, word: Boolean): Iterator[String] = {
    if (!word) {
      if (s.length < n) Iterator.single(s)
      else (0 to s.length - n).iterator.map(i => s.substring(i, i + n))
    } else {
      val words = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (Character.isLetterOrDigit(s.charAt(i))) {
          var j = i
          while (j < s.length && Character.isLetterOrDigit(s.charAt(j))) j += 1
          if (j - i >= 4) words += s.substring(i, j)
          i = j
        } else i += 1
      }
      if (words.isEmpty) Iterator.single(s)
      else if (words.length < n) Iterator.single(words.mkString(" "))
      else (0 to words.length - n).iterator.map(i => words.slice(i, i + n).mkString(" "))
    }
  }

  private def simHash(s: String, n: Int, ci: Boolean, word: Boolean): Long = {
    val votes = new Array[Long](64)
    shingleStream(s, n, word).foreach { sh =>
      val h = fnv1a64(sh, ci)
      var b = 0
      while (b < 64) {
        votes(b) += (if ((h & (1L << b)) != 0) 1 else -1)
        b += 1
      }
    }
    var res = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) res |= (1L << b); b += 1 }
    res
  }

  private def minHashPair(s: String, n: Int, k: Int, ci: Boolean, word: Boolean): (Long, Long) = {
    val distinct = mutable.SortedSet.empty[Long](Ordering.fromLessThan(
      java.lang.Long.compareUnsigned(_, _) < 0))
    shingleStream(s, n, word).foreach(sh => distinct += fnv1a64(sh, ci))
    if (distinct.isEmpty) return (0L, 0L)
    val asc = distinct.toIndexedSeq
    val smallest = asc.take(k)
    val largest = asc.takeRight(k)
    // fold order mirrors the reference's comparator-ordered map walk:
    // min side combined largest-first, max side smallest-first.
    val minC = smallest.reverse.foldLeft(0L)(mix128to64)
    val maxC = largest.foldLeft(0L)(mix128to64)
    (minC, maxC)
  }

  def stringSimHash(s: UTF8String, n: Int, ci: Boolean, word: Boolean): Long =
    if (s == null) 0L else simHash(s.toString, n, ci, word)

  // --- detect* NLP family (reference
  // src/Functions/FunctionsLanguageClassification.cpp,
  // FunctionsCharsetClassification.cpp, FunctionsTonalityClassification
  // .cpp, FunctionsProgrammingClassification.cpp). The reference embeds
  // trained frequency dictionaries / FastText-style models; none of
  // those assets exist in this container, so these spellings are HONEST
  // HEURISTIC SUBSTITUTES with the same signatures and label spaces,
  // documented as approximations: stopword-vote language ID (plus a CJK
  // codepoint check), byte-structure charset detection, a small
  // sentiment lexicon for tonality, and keyword votes for programming
  // language. Swap in real model assets to tighten accuracy — the
  // Spark-side plumbing (codegen StaticInvoke scalar) stays the same.

  private val stopwords: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist"),
    "en" -> Set("the", "and", "of", "to", "a"),
    "es" -> Set("el", "la", "de", "y", "que"),
    "fr" -> Set("le", "la", "et", "les", "des"))

  def detectLanguage(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.fromString("un")
    val text = s.toString
    // CJK vote over the Unified Ideographs base block (the block the
    // oracle can express as a codepoint range) against codepoint length.
    val cps = text.codePoints().toArray
    val cjk = cps.count(cp => cp >= 0x4e00 && cp <= 0x9fff)
    if (cjk > 0 && cjk * 4 >= cps.length) return UTF8String.fromString("zh")
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    val best = stopwords.map { case (lang, stops) =>
      (toks.count(stops.contains), lang)
    }.maxBy { case (score, lang) => (score, lang) }
    UTF8String.fromString(if (best._1 > 0) best._2 else "un")
  }

  def detectCharset(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.fromString("US-ASCII")
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    var validUtf8 = true
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 0x80) {
        ascii = false
        val len = if (b >= 0xf0) 4 else if (b >= 0xe0) 3 else if (b >= 0xc0) 2 else -1
        if (len < 0 || i + len > bytes.length ||
            (1 until len).exists(j => (bytes(i + j) & 0xc0) != 0x80)) {
          validUtf8 = false
          i += 1
        } else i += len
      } else i += 1
    }
    UTF8String.fromString(
      if (ascii) "US-ASCII" else if (validUtf8) "UTF-8" else "WINDOWS-1252")
  }

  private val positiveWords = Set(
    "good", "great", "excellent", "love", "best", "happy", "wonderful",
    "amazing", "fantastic", "perfect")
  private val negativeWords = Set(
    "bad", "terrible", "awful", "hate", "worst", "sad", "horrible",
    "poor", "disappointing", "broken")

  def detectTonality(s: UTF8String): Float = {
    if (s == null) return 0f
    val toks = s.toString.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return 0f
    val score = toks.count(positiveWords.contains) - toks.count(negativeWords.contains)
    score.toFloat / toks.length
  }

  private val progKeywords: Seq[(String, Set[String])] = Seq(
    "C++" -> Set("#include", "std::", "nullptr", "template"),
    "Java" -> Set("public", "static", "void", "extends", "import"),
    "Python" -> Set("def", "import", "self", "lambda", "elif"),
    "SQL" -> Set("select", "from", "where", "group", "join"),
    "Scala" -> Set("val", "def", "object", "trait", "implicit"))

  def detectProgrammingLanguage(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.fromString("Undefined")
    val toks = s.toString.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val best = progKeywords.map { case (lang, kws) =>
      (toks.count(t => kws.exists(k => t.startsWith(k.toLowerCase))), lang)
    }.maxBy { case (score, lang) => (score, lang) }
    UTF8String.fromString(if (best._1 > 0) best._2 else "Undefined")
  }

  /** arrayAUC(scores, labels) (reference src/Functions/array/arrayAUC
    * .cpp:106-129): sort by score DESCENDING, walk — a positive label
    * steps the curve up, a negative steps right adding the current
    * positive count to the area; result = area/(pos·neg) (NaN when a
    * class is absent, like the reference's 0/0). Score ties keep input
    * order here — the reference's std::sort is unstable, so its tie
    * order is unspecified.
    */
  def arrayAuc(
      scores: org.apache.spark.sql.catalyst.util.ArrayData,
      labels: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = scores.numElements()
    require(labels.numElements() == n, "arrayAUC: size mismatch")
    val idx = (0 until n).sortBy(i => -scores.getDouble(i))
    var area = 0L
    var pos = 0L
    idx.foreach { i =>
      if (labels.getDouble(i) > 0) pos += 1 else area += pos
    }
    val neg = n - pos
    area.toDouble / (pos.toDouble * neg)
  }

  /** arrayShuffle(arr[, seed]) — Fisher-Yates with a java.util.Random
    * seeded by `seed` (0 when omitted): a DETERMINISTIC re-expression of
    * the reference's random permutation (its RNG differs, so a given
    * seed selects a different permutation; no seed is random there).
    */
  def arrayShuffle(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      seed: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = Array.tabulate(n)(i => arr.getDouble(i))
    val rnd = new java.util.Random(seed)
    var i = n - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val t = out(i); out(i) = out(j); out(j) = t
      i -= 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def stringMinHash(
      s: UTF8String, n: Int, k: Int, ci: Boolean,
      word: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val (a, b) = if (s == null) (0L, 0L) else minHashPair(s.toString, n, k, ci, word)
    org.apache.spark.sql.catalyst.InternalRow(a, b)
  }

  /** -Arg variants (reference FunctionsStringHash.cpp:357-371 Heap::fill):
    * the SHINGLES achieving the k smallest / k largest hashes, as two
    * k-string tuples. Walk order mirrors the reference's comparator-
    * ordered map: min side DESCENDING by hash (std::greater map), max
    * side ASCENDING (std::less); short inputs pad trailing fields with
    * '' (insertDefault). Case-insensitive variants store the lowercased
    * shingle, as the reference hashes (and keeps) the lowered bytes.
    */
  def stringMinHashArg(
      s: UTF8String, n: Int, k: Int, ci: Boolean,
      word: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val m = mutable.TreeMap.empty[Long, String](Ordering.fromLessThan(
      java.lang.Long.compareUnsigned(_, _) < 0))
    if (s != null) shingleStream(s.toString, n, word).foreach { sh =>
      val h = fnv1a64(sh, ci)
      if (!m.contains(h)) m(h) = if (ci) sh.toLowerCase else sh
    }
    val asc = m.toIndexedSeq
    val minSide = asc.take(k).reverse.map(_._2)
    val maxSide = asc.takeRight(k).map(_._2)
    def tup(xs: IndexedSeq[String]) =
      org.apache.spark.sql.catalyst.InternalRow.fromSeq(
        (0 until k).map(i =>
          UTF8String.fromString(if (i < xs.length) xs(i) else "")))
    org.apache.spark.sql.catalyst.InternalRow(tup(minSide), tup(maxSide))
  }
}
