package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

import graft.operators.BpeTrainer

/** Realistic-vocab BPE evidence (VERDICT r5 Next #7): train ≥1k merges on
  * the sf0.1 corpus once, record Spark-job count / wall time / heap-encode
  * throughput — the claim under test is that the batched trainer's job
  * count scales with rounds (merges / batchK), not merges, and that the
  * O(len log len) heap encoder holds its throughput at a 1k-merge table.
  * Results land in BASELINE.md; the oracle `q_bpe_roundtrip` keeps its
  * exact 16-merge config. Not part of the driver contract. */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchK = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    import spark.implicits._

    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit = { jobs.incrementAndGet(); () }
    })

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val seqs = docs.select("text").as[String]
      .map(graft.functions.TokenCodec.encodeString)

    // minCount=1: the sf0.1 corpus is small relative to a 1k vocab, and the
    // strict >=2 cutoff exhausts it early; production corpora at 100 TB
    // saturate any cutoff
    val minCount = args.lift(3).map(_.toLong).getOrElse(1L)
    // symmetric drain: in-flight JobEnds from the read/setup jobs above
    // would otherwise land AFTER the baseline and be attributed to training
    org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
    val jobs0 = jobs.get()
    val t0 = System.nanoTime()
    val (merges, trained, rounds) =
      BpeTrainer.trainBatchedWithRounds(seqs, nMerges, minCount = minCount, batchK = batchK)
    val trainSec = (System.nanoTime() - t0) / 1e9
    // JobEnd delivery is async — drain the bus or the jobs/round evidence
    // (the very claim this profiler records) undercounts under load
    org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
    val trainJobs = jobs.get() - jobs0
    trained.unpersist(blocking = false)
    println(f"TRAIN merges=${merges.length} batchK=$batchK minCount=$minCount rounds=$rounds jobs=$trainJobs wall=$trainSec%.1f s jobs/round=${trainJobs.toDouble / rounds}%.2f jobs/merge=${trainJobs.toDouble / merges.length}%.2f")

    val table = BpeTrainer.encodeTable(merges)
    println(s"encode table monotone=${table.monotone}")
    // heap-encode throughput over the full corpus (tokens/sec), warm
    def encodePass(): (Long, Long) = {
      docs.as[(Long, String)].map { case (_, text) =>
        val orig = graft.functions.TokenCodec.encodeString(text)
        val enc = BpeTrainer.applyMergesFast(orig, table)
        (orig.length.toLong, enc.length.toLong)
      }.toDF("o", "e").agg(org.apache.spark.sql.functions.sum("o"),
        org.apache.spark.sql.functions.sum("e"))
        .as[(Long, Long)].head()
    }
    encodePass() // warmup
    val t1 = System.nanoTime()
    val (origTok, encTok) = encodePass()
    val encSec = (System.nanoTime() - t1) / 1e9
    println(f"ENCODE origTokens=$origTok encTokens=$encTok ratio=${encTok.toDouble / origTok}%.3f wall=$encSec%.2f s thr=${origTok / encSec / 1e6}%.2f Mtok/s")
    spark.stop()
  }
}
