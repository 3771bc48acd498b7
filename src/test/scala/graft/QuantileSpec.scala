package graft

import org.apache.spark.sql.functions._

import graft.functions.{QSketch, QuantileSketch}

/** The KLL-shaped quantile sketch: exact-config parity with the
  * quantile_disc rule (the oracle config), the production dial's
  * rank-error floor, merge-order invariance at the exact config, and the
  * aggregator as streaming state. The DuckDB oracle covers
  * `q_quantile_sketch` value-exactness; these cover what it can't. */
class QuantileSpec extends SparkSuite {
  import spark.implicits._

  private val qs = QuantileSketch.DefaultQs

  /** The reference rule verified against DuckDB over 2442 (n, q) cases:
    * element at idx = max(0, ceil(q·n) − 1), IEEE-double product. */
  private def exactQuantiles(vs: Array[Double], q: Seq[Double]): Seq[Double] = {
    val s = vs.sorted
    q.map(x => s(math.max(0L, math.ceil(x * s.length.toDouble).toLong - 1).toInt))
  }

  private def lcg(seed: Long, n: Int): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      // heavy-tailed-ish: mix of scales so quantiles aren't all in one bin
      ((x >>> 11).toDouble / (1L << 53).toDouble) * (1 + (x & 7L)).toDouble
    }
  }

  test("exact config (no compaction) reproduces the quantile_disc rule, fuzzed") {
    (1 to 40).foreach { trial =>
      val n = 1 + (trial * 137) % 3000
      val vs = lcg(trial.toLong, n)
      val sk = new QSketch
      vs.foreach(sk.insert(_, k = 4096))
      assert(sk.quantiles(qs) === exactQuantiles(vs, qs), s"trial $trial n=$n")
    }
  }

  test("production dial k=64: rank error bounded at n=50k (regression floor)") {
    val n = 50000
    val vs = lcg(42L, n)
    val k = 64
    // simulate Spark's partial/merge topology: 32 partition sketches merged
    val parts = vs.grouped(math.ceil(n / 32.0).toInt).toSeq.map { chunk =>
      val s = new QSketch
      chunk.foreach(s.insert(_, k))
      s
    }
    val sk = parts.reduce { (a, b) => a.absorb(b, k); a }
    val sorted = vs.sorted
    val maxErr = qs.map { q =>
      val est = sk.quantiles(Seq(q)).head
      val target = math.max(1L, math.ceil(q * n.toDouble).toLong)
      // rank of the estimate in the true sorted order (first index ≥ est)
      val rank = {
        val i = java.util.Arrays.binarySearch(sorted, est)
        if (i >= 0) i + 1L else -(i + 1).toLong
      }
      math.abs(rank - target)
    }.max
    info(s"k=$k n=$n max rank error = $maxErr (${maxErr * 100.0 / n}%)")
    // KLL-shaped guarantee is O(n/k · polylog) — measured 1.37% on this
    // fixture; pinned at 2.5% so a compaction-logic regression trips it
    assert(maxErr <= (0.025 * n).toLong, s"rank error $maxErr exceeds 2.5% of n")
  }

  test("oracle capacity covers every group at the largest driver sf (exactness precondition)") {
    // q_quantile_sketch's hash-exact oracle REQUIRES no compaction ever
    // firing: every event_type group must hold <= 2^16 non-null values.
    // sf0.1's largest group is ~20.3k (3.2x headroom); if a future fixture
    // crosses the capacity, fail HERE with the cause, not in the driver
    // gate with a confusing value mismatch.
    val maxGroup = graft.operators.EventOps.events(spark, sf("sf0.1"))
      .filter(col("value").isNotNull)
      .groupBy("event_type").count()
      .agg(max("count")).as[Long].head()
    assert(maxGroup <= (1 << 16).toLong,
      s"largest group $maxGroup exceeds the oracle-exact capacity 65536 — " +
        "raise k in EventOps.quantileSketchQuery or shrink the fixture")
  }

  test("exact config is merge-order independent: repartition(2) == repartition(7)") {
    def run(parts: Int): Seq[(String, Double, Double)] = {
      val ev = graft.operators.EventOps.events(spark, sf("sf0.001"))
        .filter(col("value").isNotNull).repartition(parts)
      ev.groupBy("event_type")
        .agg(QuantileSketch.qsketch(1 << 16, qs, col("value")).as("e"))
        .select(col("event_type"), posexplode(col("e")))
        .select(col("event_type"),
          element_at(lit(qs.toArray), col("pos").cast("int") + 1).as("q"),
          round(col("col"), 6).as("est"))
        .as[(String, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    assert(run(2) === run(7))
  }

  test("sketch aggregates in a streaming groupBy across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val out = mem.toDF().toDF("g", "v")
      .groupBy("g")
      .agg(QuantileSketch.qsketch(1 << 16, Seq(0.5), col("v")).as("e"))
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("qsk_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("qsk_cp").toString)
      .start()
    val b1 = (1 to 100).map(i => ("a", i.toDouble))
    val b2 = (101 to 200).map(i => ("a", i.toDouble))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("qsk_stream")
      .select(col("g"), element_at(col("e"), 1))
      .as[(String, Double)].collect().toMap
    // exact config over 1..200 → median under the disc rule = element 100
    assert(got === Map("a" -> 100.0))
  }
}
