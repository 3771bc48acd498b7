package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvBuf, KmvSketch}

/** KMV bottom-k sketch: exact-while-under-capacity, set-function
  * determinism (the k smallest hashes don't depend on partitioning —
  * asserted at the SMALL production k, where KLL/HLL-style sketches
  * can't make that promise), union-sketch correctness, and the production
  * dial's relative-error floor. `q_kmv_overlap`'s DuckDB oracle covers
  * corpus value-exactness at the exact config. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  private def hashes(seed: Long, n: Int): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x ^ (x >>> 29)
    }
  }

  test("under capacity the sketch IS the hashed set; estimate = exact count") {
    val hs = hashes(1L, 500).distinct
    val b = new KmvBuf
    hs.foreach(h => b.offer(h, 1024))
    // duplicates are absorbed
    hs.foreach(h => b.offer(h, 1024))
    assert(b.keys.size === hs.length)
    val keys = (new KmvSketch.Agg(1024)).finish(b).toIndexedSeq
    assert(KmvSketch.estimate(keys, 1024) === hs.length.toDouble)
    assert(keys === keys.sorted)
  }

  test("production dial k=256: relative error bounded, and bit-deterministic across partitionings") {
    val n = 100000
    val vs = (0 until n).map(i => s"item-$i")
    def run(parts: Int): IndexedSeq[Long] =
      vs.toDF("v").repartition(parts)
        .agg(KmvSketch.kmv(256, xxhash64(col("v"))))
        .as[Seq[Long]].head().toIndexedSeq
    val k2 = run(2)
    val k31 = run(31)
    // the k smallest hashes are a function of the input SET — identical
    // keys (not just close estimates) whatever the plan
    assert(k2 === k31)
    val est = KmvSketch.estimate(k2, 256)
    val relErr = math.abs(est - n) / n.toDouble
    info(f"k=256 n=$n est=$est%.0f relative error ${relErr * 100}%.2f%%")
    // KMV stderr ≈ 1/sqrt(k-2) ≈ 6.3%; pin 3 sigma
    assert(relErr <= 0.19, f"relative error $relErr%.3f exceeds 19%%")
  }

  test("union sketch == sketch of the union; inclusion-exclusion recovers the overlap") {
    val k = 512
    val a = hashes(7L, 3000).distinct
    val b = (hashes(7L, 3000).take(1200) ++ hashes(11L, 2000)).distinct
    def sk(hs: Array[Long]): IndexedSeq[Long] = {
      val buf = new KmvBuf
      hs.foreach(buf.offer(_, k))
      (new KmvSketch.Agg(k)).finish(buf).toIndexedSeq
    }
    val u1 = KmvSketch.unionKeys(sk(a), sk(b), k)
    val u2 = sk((a ++ b).distinct)
    assert(u1 === u2, "merged sketches != sketch of merged stream")
    // exact regime check at a capacity that holds everything
    val big = 1 << 14
    def skBig(hs: Array[Long]): IndexedSeq[Long] = {
      val buf = new KmvBuf
      hs.foreach(buf.offer(_, big))
      (new KmvSketch.Agg(big)).finish(buf).toIndexedSeq
    }
    val dA = KmvSketch.estimate(skBig(a), big)
    val dB = KmvSketch.estimate(skBig(b), big)
    val dU = KmvSketch.estimate(KmvSketch.unionKeys(skBig(a), skBig(b), big), big)
    val trueInter = a.toSet.intersect(b.toSet).size
    assert(dA + dB - dU === trueInter.toDouble)
  }
}
