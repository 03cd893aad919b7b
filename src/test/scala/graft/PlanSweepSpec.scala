package graft

/** Sweep every registered query's physical plan for accidental
  * O(n·m) join strategies. Cartesian/broadcast-nested-loop joins are only
  * legal where the query is *about* an all-pairs or non-equi shape; a new
  * query that silently plans one anywhere else fails here before it can
  * become a 100 TB incident.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Queries whose semantics genuinely require a cross/non-equi pair join
  // (tiny or broadcast side by construction), or that execute streams.
  private val allPairsByDesign = Set(
    "join_cross",           // CROSS JOIN capability itself
    "join_nonequi_range",   // range-theta join
    "knn_bruteforce_cosine", // exact all-pairs baseline (broadcast probes)
    "knn_ivf_topk", "knn_ivf_kmeans_topk", // centroid assignment cross join (k centroids broadcast)
    "string_levenshtein_pairs", // all-pairs over ~25 distinct names
    "dedup_cosine_pairs",   // exact near-dup baseline (LSH variants are the scale path)
    "label_pair_similarity",    // labelled pair sample
    "subq_quantified",      // scalar-subquery comparisons plan as BNLJ probes
    "tpcds_multi_count_scalars", // q88 shape: battery of scalar-count subqueries
    "bitmap_user_overlap",  // 1-row x 1-row: two singleton bitmap aggregates combined
    "bitmap_subset_slice",  // same 1-row x 1-row singleton-bitmap shape
    "bitmap_value_algebra", // same 1-row x 1-row singleton-bitmap shape
    "sketch_theta_setops",  // same 1-row x 1-row sketch-state shape
    "tpcds_promo_ratio",    // q61 shape: 1-row x 1-row scalar-aggregate ratio
    "tpcds_below_avg_parts", // q65 shape: broadcast of a 1-row scalar aggregate
    "tpcds_frequent_best_sales", // q23 shape: broadcast 1-row max-spend scalar
    "q11_important_stock",  // broadcast of a 1-row grand-total scalar (r15: the
                            // HAVING threshold reuses the grouped exchange)
    "trivial_count"         // metadata-only
  )
  private val skipExecutionShapes = Set(
    "stream_tumbling_counts", "stream_stateful_counts", "stream_session_counts")

  test("no query plans an accidental cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allPairsByDesign(name) || skipExecutionShapes(name)) None
      else {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    }
    assert(offenders.isEmpty, s"unexpected pair-join plans in: $offenders")
  }
}
