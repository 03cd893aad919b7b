package graft

/** Quantitative quality gates for the oracle-less ANN variants: recall
  * against the exact brute-force neighbors at sf0.001. These are the
  * checks CORRECTNESS can't do for approximate operators — if a refactor
  * silently degrades bucketing or centroid training, recall collapses and
  * this fails long before anyone reads bench output.
  */
class AnnRecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** probe_id → neighbor ids, from a (probe_id, rn, neighbor_id, sim) result. */
  private def neighbors(q: String, k: Int): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
      .map { case (p, rows) => p -> rows.map(_._2).take(k).toSet }

  private def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (p, t) =>
      got.getOrElse(p, Set.empty).count(t.contains).toDouble / t.size
    }
    hits.sum / truth.size
  }

  private lazy val bruteTop5 = neighbors("knn_bruteforce_cosine", 5)

  test("hyperplane-LSH top-k recall vs brute force") {
    val r = recall(neighbors("knn_lsh_topk", 5), bruteTop5)
    info(f"knn_lsh_topk recall@5 = $r%.3f")
    assert(r >= 0.6, f"LSH recall collapsed: $r%.3f (0.74 at parity)")
  }

  test("IVF k-means top-k recall vs brute force") {
    val truth3 = neighbors("knn_bruteforce_cosine", 3)
    val r = recall(neighbors("knn_ivf_kmeans_topk", 3), truth3)
    info(f"knn_ivf_kmeans_topk recall@3 = $r%.3f")
    assert(r >= 0.7, f"IVF-kmeans recall collapsed: $r%.3f (0.83 at parity)")
  }
}
