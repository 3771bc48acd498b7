package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding trainer over token sequences — the
  * tokenizer-training pass of a training-data pipeline, run directly on the
  * north-rule input shape (`tokens: array<int>`).
  *
  * Algorithm (Sennrich et al. 2016, the public BPE formulation): repeat
  * nMerges times — count adjacent token pairs corpus-wide, merge the most
  * frequent pair into a fresh token id everywhere. Each iteration is
  *  1. a flatMap emitting packed 64-bit pair keys with map-side combining
  *     (groupBy(long).count — the shuffle carries (pairKey, count), never
  *     sequences), then a tiny reduction to ONE winner row on the driver
  *     (deterministic tiebreak: count desc, key asc);
  *  2. a narrow per-partition map rewriting sequences greedily
  *     left-to-right — no shuffle.
  * So a full training run is nMerges small-key shuffles + nMerges narrow
  * passes; at cluster scale the pair-count shuffle is tiny (≤ vocab² keys,
  * combined map-side) and the rewrite is embarrassingly parallel. Lineage
  * is kept shallow by persisting each generation and unpersisting the
  * last — K iterations never replay the chain from the source.
  */
object BpeTrainer {

  /** One learned merge: (left, right) → fresh id, with its corpus count at
    * merge time. */
  final case class Merge(left: Int, right: Int, newId: Int, count: Long)

  private def packPair(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xFFFFFFFFL)

  /** Greedy left-to-right single-pair rewrite (the standard BPE apply). */
  def mergeOnce(seq: Array[Int], left: Int, right: Int, newId: Int): Array[Int] = {
    if (seq.length < 2) return seq
    val out = new scala.collection.mutable.ArrayBuffer[Int](seq.length)
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == left && seq(i + 1) == right) {
        out += newId; i += 2
      } else { out += seq(i); i += 1 }
    }
    out.toArray
  }

  /** Train `nMerges` merges. Returns the learned merge table (in order) and
    * the final rewritten corpus. `minCount` stops early when no pair
    * clears it (degenerate corpora). Fresh ids start one past the corpus
    * max so they can never collide with an existing token. */
  def train(seqs: Dataset[Array[Int]], nMerges: Int,
            minCount: Long = 2L): (Seq[Merge], Dataset[Array[Int]]) = {
    val spark = seqs.sparkSession
    import spark.implicits._
    var current = seqs.persist(StorageLevel.MEMORY_AND_DISK)
    val maxRow = current.flatMap(s => s.headOption.map(_ => s.max)).toDF("v")
      .agg(org.apache.spark.sql.functions.max("v")).collect()(0)
    var nextId = if (maxRow.isNullAt(0)) 0 else maxRow.getInt(0) + 1
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < nMerges && !done) {
      val winner = current
        .flatMap(s => (0 until s.length - 1).map(i => packPair(s(i), s(i + 1))))
        .groupBy("value").count()
        .orderBy(org.apache.spark.sql.functions.col("count").desc,
          org.apache.spark.sql.functions.col("value").asc)
        .limit(1).as[(Long, Long)].collect().headOption
      winner match {
        case Some((key, cnt)) if cnt >= minCount =>
          val (l, r) = ((key >> 32).toInt, key.toInt)
          val id = nextId
          val next = current.map(mergeOnce(_, l, r, id))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent
          current.unpersist()
          current = next
          merges += Merge(l, r, id, cnt)
          nextId += 1
        case _ => done = true
      }
    }
    (merges.toSeq, current)
  }

  /** The tokenizer side: apply a learned merge table to any sequence (e.g.
    * new documents at encode time). Merges must be applied in learned
    * order — later merges may consume earlier merge outputs. */
  def applyMerges(seq: Array[Int], merges: Seq[Merge]): Array[Int] =
    merges.foldLeft(seq)((s, m) => mergeOnce(s, m.left, m.right, m.newId))

  /** Encode a whole dataset with a learned merge table — one narrow pass
    * (the merge table broadcasts inside the closure). */
  def encode(seqs: Dataset[Array[Int]], merges: Seq[Merge]): Dataset[Array[Int]] = {
    import seqs.sparkSession.implicits._
    seqs.map(applyMerges(_, merges))
  }

  /** Reduction in corpus token count per learned merge — the audit a
    * tokenizer build reports. `count` is the adjacent-pair count at merge
    * time, an upper bound on tokens removed (overlapping runs like `aaa`
    * count two pairs but merge once); measure the exact ratio from the
    * returned corpus sizes. */
  def compressionReport(merges: Seq[Merge], originalTokens: Long): Seq[(Int, Long, Double)] = {
    var remaining = originalTokens
    merges.map { m =>
      remaining -= m.count
      (m.newId, m.count, remaining.toDouble / originalTokens)
    }
  }
}
