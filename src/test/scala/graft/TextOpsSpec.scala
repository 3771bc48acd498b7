package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Training-data dedup/analysis operators over the documents table:
  * the probabilistic signatures are checked against the exact ground truth
  * (jaccardPairs) computed on the same data. */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("minhash LSH finds every exact-jaccard pair (recall) with perfect precision") {
    val exact = TextOps.jaccardPairs(spark, dir, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = TextOps.minhashLshPairs(spark, dir, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact) // verification step makes precision exact; bands give ~1.0 recall
  }

  test("simhash: near-dup pairs have small hamming distance; candidates cover planted pairs") {
    val planted = TextOps.jaccardPairs(spark, dir, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = TextOps.simhashPairs(spark, dir, maxHamming = 16)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val simPairs = sim.map(t => (t._1, t._2)).toSet
    val covered = planted.intersect(simPairs)
    // simhash is a weaker signal than minhash on word-permuted docs — expect
    // high but not necessarily perfect coverage of the planted pairs
    assert(covered.size >= (planted.size * 0.8).toInt,
      s"simhash covered ${covered.size}/${planted.size} planted pairs")
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp1 = TextOps.fingerprint(spark, dir).as[(Long, Long)].collect().toMap
    val fp2 = TextOps.fingerprint(spark, dir).as[(Long, Long)].collect().toMap
    assert(fp1 === fp2)
    // shuffled word order must change the fingerprint (rolling hash)
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      aggregate(transform(split(col("text"), " "),
          w => xxhash64(w).bitwiseAND(lit(2147483647L))),
        lit(0L), (acc, x) => pmod(acc * lit(31L) + x, lit(2147483647L))))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) !== fps(2L))
  }

  test("exact dedup groups byte-identical texts") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = docs.groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    val m = out.select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L, 3L -> 1L))
  }

  test("language-ID prediction equals argmax of profile hits") {
    val out = TextOps.langId(spark, dir).collect()
    out.foreach { r =>
      val (h1, h2, h3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = if (h1 >= h2 && h1 >= h3) "p1" else if (h2 >= h3) "p2" else "p3"
      assert(r.getString(4) === expected)
    }
  }

  test("frame sampling explodes one payload into deterministic frame rows") {
    val frames = TextOps.frameSample(spark, dir)
      .select("doc_id", "frame_idx", "byte_offset").as[(Long, Int, Long)].collect()
    val byDoc = frames.groupBy(_._1)
    byDoc.foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq === (0 until g.length))
      assert(g.forall(f => f._3 === f._2 * 64L))
    }
    // thumbnails are payload slices
    val t = TextOps.frameSample(spark, dir).select("thumb").limit(1).collect()
    assert(t.head.getAs[Array[Byte]](0).length > 0)
  }

  test("multimodal metadata is a pure function of the payload bytes") {
    val a = TextOps.multimodalMeta(spark, dir).orderBy("doc_id").collect()
    val b = TextOps.multimodalMeta(spark, dir).orderBy("doc_id").collect()
    assert(a === b)
    assert(a.forall(r => r.getLong(1) > 0 && r.getLong(2) >= 64 && r.getLong(3) >= 64))
  }
}
