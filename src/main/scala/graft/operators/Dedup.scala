package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Document deduplication operators for the training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH and SimHash candidate generation.
  *
  * Scale design: every variant is a hash shuffle on a digest/band key —
  * never an all-pairs comparison. At 100 TB the candidate-pair join only
  * materializes within LSH buckets, so cost tracks the true near-dup
  * density, not n².
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per content digest. One shuffle
    * on the digest. (Unique-key-table semantics, SURVEY §1.1 —
    * dedup-on-read via min-per-key.)
    */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("__digest", md5(col(textCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__digest")).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn", "__digest")

  /** MinHash+LSH candidate pairs: shingle → minhash signature → band keys
    * → self-join within (band, key) buckets. Returns distinct (id_a, id_b)
    * with id_a < id_b.
    */
  def minhashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Native per-row signatures (MinHashSignature codegen expression):
    // the whole minhash computes inside the document scan — zero shuffles
    // before banding, no shingle strings, no explode. Documents shorter
    // than the shingle size have no shingles → null signature → dropped.
    val sig = df.select(col(idCol).as("id"),
        minhashSignatureNative(tokens(col(textCol)), shingleSize, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = sig.select(col("id"),
        posexplode(lshBands(col("sig"), bands, rowsPerBand)).as(Seq("band", "key")))
    bucketPairs(banded)
  }

  /** Candidate pairs from bucket membership: group ids per (band, key)
    * and emit bucket-local combinations — ONE shuffle on the bucket key
    * and no self-join (a self-join would run the whole upstream pipeline
    * twice or force a persist). Bucket sizes are bounded by LSH design,
    * so the per-bucket pair expansion is local and small.
    */
  private def bucketPairs(banded: DataFrame): DataFrame =
    banded.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** SimHash bucket candidates: docs sharing any 16-bit simhash band are
    * near-dup candidates (hamming distance ≤ 3 guaranteed to collide on
    * ≥1 of 4 bands).
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String): DataFrame =
    bucketPairs(df.select(col(idCol).as("id"),
      posexplode(simhashBands(col(textCol))).as(Seq("band", "key"))))

  /** Exact token-set Jaccard similarity for all pairs with J ≥ threshold,
    * via prefix-filtered inverted-index candidates + exact array-intersect
    * verification — the oracle-checkable baseline for the MinHash
    * approximation.
    *
    * Prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    * Search", WWW'07): order every document's tokens by a global total
    * order (document frequency ascending, token ascending as tiebreak) and
    * index only each doc's first |d| − ⌈t·|d|⌉ + 1 tokens. If J(x,y) ≥ t,
    * the globally-smallest shared token is provably inside BOTH prefixes,
    * so the candidate join loses no qualifying pair. Crucially, a
    * universal stopword has maximal df, lands last in every ordering, and
    * almost never enters a prefix — the Σdf² skew bomb of a naive
    * inverted-index self-join cannot form.
    */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String, threshold: Double): DataFrame = {
    // Join on a 64-bit token hash instead of the token string: narrow
    // fixed-width keys cut exchange + probe cost (collision odds over any
    // realistic vocabulary are ~2^-40, far below the float-equality
    // tolerance everywhere else).
    val toks = df.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok_s"))
      .select(col("id"), xxhash64(col("tok_s")).as("tok"))
    // r15 (guide §5 caching note): NO persist of the per-doc token table —
    // a MEMORY_AND_DISK cache of the tokenized corpus is the same
    // per-query corpus-sized-cache hazard the r15 wave-1 commit removed
    // from knn_lsh_topk, and in the prepared-plan bench the cache
    // materialization was pure per-rep overhead (0.164 → 0.088 s min at
    // sf0.1 without it). The downstream uses that can recompute the docs
    // subtree are small-side builds of the candidate/verify joins, which
    // AQE's stage reuse dedupes when they shuffle at scale.
    val docs = prefixDocs(toks, threshold)
    // Exact verification: one row per candidate pair, intersection counted
    // on the two (bounded-size) per-doc token arrays — no token-level
    // shuffle ever sees a hot key.
    candidatesFromDocs(docs)
      .join(docs.select(col("id").as("id_a"), col("ts").as("ts_a"), col("n_tok").as("n_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("ts").as("ts_b"), col("n_tok").as("n_b")), "id_b")
      .withColumn("n_inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-doc token arrays in global (df asc, tok asc) order plus the
    * prefix length — ONE groupBy builds both the candidate prefix (a
    * slice) and the verification array, no per-doc window needed.
    */
  private def prefixDocs(toks: DataFrame, threshold: Double): DataFrame = {
    val dfTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfTok, "tok")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("dt"))
      .select(col("id"),
        expr("transform(dt, x -> x.tok)").as("ts"),
        size(col("dt")).as("n_tok"))
      .withColumn("p",
        (col("n_tok") - ceil(lit(threshold) * col("n_tok")) + 1).cast("int"))
  }

  /** Candidate (id_a, id_b) pairs whose df-ordered prefixes share a
    * token, from [[prefixDocs]] output: explode only each doc's first `p`
    * (rarest) tokens into the inverted index.
    */
  private def candidatesFromDocs(docs: DataFrame): DataFrame = {
    val prefix = docs.select(col("id"),
      explode(call_function("slice", col("ts"), lit(1), col("p"))).as("tok"))
    prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Candidate pairs whose df-ordered prefixes share a token — an exact
    * superset of all pairs with J ≥ threshold (see [[jaccardPairs]]).
    * Package-private so tests can assert the candidate set stays linear
    * under adversarial universal tokens.
    */
  private[graft] def prefixCandidates(toks: DataFrame, threshold: Double): DataFrame =
    candidatesFromDocs(prefixDocs(toks, threshold))

  /** Connected components over a near-duplicate pair graph: the step a
    * 100 TB dedup pipeline needs BETWEEN pair generation (minhash /
    * jaccard) and row dropping — near-duplication is transitive in
    * practice (A≈B, B≈C ⇒ keep one of {A,B,C}), so the unit of
    * deduplication is the component, not the pair.
    *
    * Min-label propagation (the dataflow form of union-find): every node
    * starts labeled with itself; each round pushes labels across edges
    * and keeps the minimum. Converges in graph-diameter rounds — near-dup
    * components are dense (LSH buckets ≈ cliques), so diameter is small;
    * `maxIter` bounds the worst case and a converged run exits early.
    * Each round is one join + one groupBy on the EDGE list (not the
    * corpus), and `localCheckpoint` cuts the growing lineage so round N
    * doesn't replan rounds 1..N-1 — the standard Pregel-loop shape.
    * The driver sees only the one-row convergence probe per round.
    *
    * Returns (id, label) with label = min id of the component; only nodes
    * that appear in `pairs` are returned (isolated docs are their own
    * canonical trivially).
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      iter += 1
      // Iteration count is the scale-sensitive variable (rounds ∝
      // component diameter, not corpus size) — log it per round so a
      // diameter blow-up at N× shows in the soak output, not just as
      // unexplained wall-clock.
      System.err.println(
        s"[dedup-cc] round $iter: ${if (converged) "converged" else "labels changed"}")
    }
    edges.unpersist()
    labels
  }
}
