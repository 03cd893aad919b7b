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
  def guarded(df: DataFrame, maxRows: Long = 100000L): DataFrame = {
    // Persist before counting so the guard's count action materializes the
    // upstream plan once and the n² join that follows reuses the cached
    // rows — the guard no longer double-computes the input. The cache is
    // bounded by the guard itself (≤ maxRows rows) and evicts LRU.
    val cached = df.persist()
    val n = cached.count()
    if (n > maxRows) {
      cached.unpersist()
      throw new IllegalArgumentException(
        s"all-pairs baseline refused: input has $n rows > bound $maxRows " +
          "(this operator is an O(n^2) test oracle; use the LSH/IVF variant at scale)")
    }
    cached
  }
}
