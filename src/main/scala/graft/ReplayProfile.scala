package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of the incremental-dedup replay paths
  * (`q_dup_clusters_incremental` / `q_dup_clusters_durable`): counts every
  * Spark job and its wall time, grouped by job description — the evidence
  * for per-batch fixed-cost reduction (guide §1.5/§2). Args: [sfDir]
  * [inmem|durable|both]. */
object ReplayProfile {

  private final class JobLog extends SparkListener {
    val started = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val desc = Option(j.properties.getProperty("spark.job.description"))
        .getOrElse("(none)")
      started.put(j.jobId, (System.nanoTime(), desc))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      started.remove(j.jobId).foreach { case (t0, desc) =>
        rows.synchronized { rows += ((desc, (System.nanoTime() - t0) / 1e9)) }
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.drop(1).headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    // warmup (codegen/parquet init)
    SparkEntry.queries("q_lrs_by_id")(spark, sfDir).count()

    def run(tag: String)(body: => Long): Unit = {
      val log = new JobLog
      spark.sparkContext.addSparkListener(log)
      val t0 = System.nanoTime()
      val n = body
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(log)
      Thread.sleep(300) // let listener drain
      val byDesc = log.rows.groupBy(_._1).view
        .mapValues(v => (v.size, v.map(_._2).sum)).toSeq
        .sortBy(-_._2._2)
      println(f"== $tag: wall $wall%.2f s, rows=$n, jobs=${log.rows.size}, " +
        f"job-time sum ${log.rows.map(_._2).sum}%.2f s")
      byDesc.foreach { case (d, (cnt, s)) =>
        println(f"   $cnt%3d jobs $s%7.2f s  $d") }
    }

    if (mode == "inmem" || mode == "both")
      run("inmem")(streaming.IncrementalDedup.replayClusters(spark, sfDir).count())
    if (mode == "durable" || mode == "both")
      run("durable") {
        val lake = operators.LayoutOps.scratchDir("graft-durdedup-prof")
        try streaming.IncrementalDedup
          .replayClustersDurable(spark, sfDir, lake.toString)
          .localCheckpoint(true).count()
        finally operators.LayoutOps.deleteTree(lake)
      }
    spark.stop()
  }
}
