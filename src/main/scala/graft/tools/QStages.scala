package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-stage breakdown of one prepared-plan rep (bench rep
  * model: warmed plan, memoized broadcasts, shuffle outputs reset so
  * every stage re-runs). Prints stage name, task count, total task time,
  * wall estimate, shuffle read/write bytes — the Spark-UI stage table,
  * headless.
  *
  * Usage: runMain graft.tools.QStages <sfDir> <name> [reps]
  */
object QStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())

    case class St(var n: Int = 0, var taskMs: Long = 0, var wallMs: Long = 0,
                  var srBytes: Long = 0, var swBytes: Long = 0,
                  var inBytes: Long = 0, var gcMs: Long = 0,
                  var serMs: Long = 0, var desMs: Long = 0, var name: String = "")
    val stages = scala.collection.concurrent.TrieMap[Int, St]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (record) {
        val s = stages.getOrElseUpdate(t.stageId, St())
        s.n += 1
        val m = t.taskMetrics
        if (m != null) {
          s.taskMs += m.executorRunTime
          s.gcMs += m.jvmGCTime
          s.serMs += m.resultSerializationTime
          s.desMs += m.executorDeserializeTime
          s.srBytes += m.shuffleReadMetrics.totalBytesRead
          s.swBytes += m.shuffleWriteMetrics.bytesWritten
          s.inBytes += m.inputMetrics.bytesRead
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (record) {
        val info = e.stageInfo
        val s = stages.getOrElseUpdate(info.stageId, St())
        s.name = info.name.take(60)
        s.wallMs += (for {a <- info.completionTime; b <- info.submissionTime} yield a - b).getOrElse(0L)
      }
    })

    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan
    def consume(): Unit =
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
    (1 to 2).foreach { _ => spark.catalog.clearCache(); consume() }
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      org.apache.spark.graftbench.ShuffleReset.resetAll(spark.sparkContext)
      stages.clear(); record = true
      val t0 = System.nanoTime()
      consume()
      val wall = (System.nanoTime() - t0) / 1e9
      record = false
      println(f"[qstages] $name rep $i wall=$wall%.3f s")
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        println(f"[qstages]   stage $id%4d tasks=${s.n}%4d wall=${s.wallMs}%5d ms task=${s.taskMs}%6d ms des=${s.desMs}%5d gc=${s.gcMs}%4d in=${s.inBytes / 1024}%8d KB sr=${s.srBytes / 1024}%7d KB sw=${s.swBytes / 1024}%7d KB  ${s.name}")
      }
    }
    spark.stop()
  }
}
