package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard for the exact all-pairs baseline queries (`dedup_cosine_pairs`,
  * `label_pair_similarity`): those are O(n²) oracle ground truths, never
  * the scale path (that's the LSH/IVF bucketed variants). This gate makes
  * pointing one at a production-sized table an immediate, explicit error
  * instead of a cluster-melting broadcast — the count costs one cheap
  * column-pruned scan, trivial next to the n² join it authorizes.
  */
object AllPairs {

  /** The most recent guard's cache. Each call retires the previous one,
    * so a session holds AT MOST ONE live guard cache (≤ maxRows rows)
    * however many times the baselines run — callers never own cleanup.
    * Unpersisting a retired cache is always safe: a plan that still
    * references it just recomputes.
    */
  private var live: Option[DataFrame] = None

  def guarded(df: DataFrame, maxRows: Long = 100000L): DataFrame = synchronized {
    live.foreach(_.unpersist())
    live = None
    // Persist before counting so the guard's count action materializes the
    // upstream plan once and the n² join that follows reuses the cached
    // rows — the guard no longer double-computes the input.
    val cached = df.persist()
    val n = cached.count()
    if (n > maxRows) {
      cached.unpersist()
      throw new IllegalArgumentException(
        s"all-pairs baseline refused: input has $n rows > bound $maxRows " +
          "(this operator is an O(n^2) test oracle; use the LSH/IVF variant at scale)")
    }
    live = Some(cached)
    cached
  }
}
