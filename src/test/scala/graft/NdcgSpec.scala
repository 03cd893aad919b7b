package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Brute-force differential for the ndcg lowering: the dual-window join
  * plan must reproduce a literal Scala transcription of the reference's
  * calcNdcg (AggregateFunctionNdcg.h:100 — group by rank_id, sort by
  * pred desc, rel = 2^(label+1)−1 against own rank for IDCG and the i-th
  * smallest rank for DCG, mean of dcg/idcg) on random data.
  */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  private def bruteNdcg(rows: Seq[(Int, Int, Double, Int)]): Double = {
    val byRankId = rows.groupBy(_._1)
    val perGroup = byRankId.values.map { entries =>
      val byPred = entries.sortBy(e => (-e._3, e._2, e._4))
      val realRank = byPred.map(_._2).sorted
      var dcg = 0.0
      var idcg = 0.0
      byPred.zipWithIndex.foreach { case (e, i) =>
        val rel = (1L << (e._4 + 1)) - 1.0
        idcg += rel / (math.log(e._2 + 2.0) / math.log(2.0))
        dcg += rel / (math.log(realRank(i) + 2.0) / math.log(2.0))
      }
      dcg / idcg
    }
    perGroup.sum / perGroup.size
  }

  test("ndcg dual-window plan matches the reference algorithm on random data") {
    val rnd = new Random(7)
    // (rank_id, rank, pred, label): unique (rank_id, rank) pairs, distinct
    // preds (the reference's pred sort is unstable under ties).
    val rows = (for {
      rid <- 0 until 4
      rank <- 0 until 12
    } yield (rid, rank, rnd.nextDouble(), rnd.nextInt(4))).toSeq
    val df = rows.toDF("rank_id", "rank", "pred", "label").repartition(5)

    import org.apache.spark.sql.expressions.Window
    import Num._
    val rel = (pow(lit(2.0), col("label") + 1) - 1).cast("double")
    val byPred = Window.partitionBy(col("rank_id"))
      .orderBy(col("pred").desc, col("rank"), col("label"))
    val byRank = Window.partitionBy(col("rank_id"))
      .orderBy(col("rank"), col("pred"), col("label"))
    val predSide = df.select(col("rank_id"), rel.as("rel"), col("rank"),
      row_number().over(byPred).as("pos"))
    val rankSide = df.select(col("rank_id"), col("rank"),
      row_number().over(byRank).as("pos"))
    val perGroup = predSide.alias("p")
      .join(rankSide.alias("r"), Seq("rank_id", "pos"))
      .groupBy(col("rank_id"))
      .agg(dsum6(col("p.rel") / log2(col("p.rank") + 2)).as("idcg"),
        dsum6(col("p.rel") / log2(col("r.rank") + 2)).as("dcg"))
    val got = perGroup.agg(avg(col("dcg") / col("idcg"))).collect()(0).getDouble(0)
    // dsum6 quantizes each element to 6 decimals (up to 5e-7 × n_elements
    // per sum); the brute force sums raw doubles — compare to the
    // quantization bound, not machine epsilon.
    assert(math.abs(got - bruteNdcg(rows)) < 1e-4)
  }
}
