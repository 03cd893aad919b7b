package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline:
  * tokenization, quality metrics, fingerprinting, shingling, MinHash and
  * SimHash signatures, and a heuristic language identifier.
  *
  * Everything is composed from codegen'd built-ins (higher-order array
  * functions + xxhash64) — no Scala UDFs, so the whole pipeline stays
  * inside whole-stage codegen and scales linearly with the scan.
  */
object TextFunctions {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: alphabetic runs, digit runs,
    * and punctuation runs each count as one token (the GPT-2-style
    * pre-tokenization split, ASCII-portable so external engines agree on
    * the regex).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Occurrences of an exact token (e.g. a stopword). */
  def tokenOccurrences(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word))

  /** Stopword ratio against a fixed stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      size(toks).cast("double")
  }

  /** Deterministic document fingerprint: hex-md5 prefix of the normalized
    * text (reference hash family, /root/reference/src/Functions/FunctionsHashing.cpp).
    */
  def fingerprint(text: Column, len: Int = 16): Column =
    substring(md5(lower(trim(text))), 1, len)

  /** Word k-shingles as an array of strings; empty when fewer than k tokens. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array())
  }

  /** MinHash signature over word k-shingles: numHashes independent hash
    * slots via seeded xxhash64 (MinHash+LSH dedup, SURVEY build brief).
    * Compositional higher-order form; [[minhashSignatureNative]] is the
    * codegen'd per-row variant used on the hot path.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val sh = shingles(text, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))
  }

  /** Native codegen MinHash signature from a token array (null when the
    * document has fewer than k tokens) — see [[MinHashSignature]].
    */
  def minhashSignatureNative(toks: Column, k: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(toks), numHashes, k))
  }

  /** LSH band keys from a MinHash signature: one xxhash64 per band of
    * `rowsPerBand` signature slots. Docs sharing any band key are
    * near-duplicate candidates.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand))))

  /** 64-bit SimHash of the token set, returned as 4 × 16-bit band values
    * (ready for hamming-style bucketing). Majority vote per bit over
    * xxhash64 token hashes.
    */
  def simhashBands(text: Column): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0, 1L)
        .otherwise(0L))
    transform(sequence(lit(0), lit(3)), band =>
      aggregate(sequence(lit(0), lit(15)), lit(0L),
        (acc, i) => acc + element_at(bits, band * 16 + i + lit(1)) * call_function("shiftleft", lit(1L), i)))
  }

  /** Heuristic language ID: score each candidate language by its stopword
    * hit count and pick the argmax (n-gram/stopword heuristic; languages
    * without hits fall back to 'und').
    */
  def langId(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val toks = tokens(text)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      val stopArr = array(stops.map(lit): _*)
      struct(size(filter(toks, t => array_contains(stopArr, t))).as("score"),
             lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
