package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * combined map-side) and the rewrite is embarrassingly parallel. Each
  * generation is eagerly localCheckpoint-ed (reliable `checkpoint()` on a
  * real cluster): persist alone keeps the LOGICAL plan growing one nested
  * level per merge, and at tokenizer-scale merge counts the plan string
  * alone OOMs the driver — checkpointing truncates plan + lineage so K
  * iterations never replay the chain and never grow the plan. */
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

  /** First fresh id: one past the corpus max token — merged ids can never
    * collide with an existing token. Shared by both trainers (a drifting
    * copy of the seeding rule would silently change one table). */
  private def seedNextId(current: Dataset[Array[Int]]): Int = {
    import current.sparkSession.implicits._
    val maxRow = current.flatMap(s => s.headOption.map(_ => s.max)).toDF("v")
      .agg(org.apache.spark.sql.functions.max("v")).collect()(0)
    if (maxRow.isNullAt(0)) 0 else maxRow.getInt(0) + 1
  }

  /** Corpus-wide adjacent-pair counts (packed 64-bit keys), sorted by the
    * deterministic tiebreak (count desc, key asc) — the per-round shuffle
    * both trainers share. */
  private def rankedPairCounts(current: Dataset[Array[Int]]): DataFrame = {
    import current.sparkSession.implicits._
    current
      .flatMap(s => (0 until s.length - 1).map(i => packPair(s(i), s(i + 1))))
      .groupBy("value").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("value").asc)
  }

  /** Train `nMerges` merges. Returns the learned merge table (in order) and
    * the final rewritten corpus. `minCount` stops early when no pair
    * clears it (degenerate corpora). Kept as an independent loop rather
    * than `trainBatched(batchK = 1)` on purpose: this is the oracle the
    * batched trainer's equivalence is fuzz-tested against, and an oracle
    * that delegates to the code under test proves nothing. */
  def train(seqs: Dataset[Array[Int]], nMerges: Int,
            minCount: Long = 2L): (Seq[Merge], Dataset[Array[Int]]) = {
    val spark = seqs.sparkSession
    import spark.implicits._
    var current = seqs.persist(StorageLevel.MEMORY_AND_DISK)
    var nextId = seedNextId(current)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < nMerges && !done) {
      val winner = rankedPairCounts(current)
        .limit(1).as[(Long, Long)].collect().headOption
      winner match {
        case Some((key, cnt)) if cnt >= minCount =>
          val (l, r) = ((key >> 32).toInt, key.toInt)
          val id = nextId
          // eager localCheckpoint: materializes AND truncates plan+lineage
          // (persist would leave an ever-deepening logical plan)
          val next = current.map(mergeOnce(_, l, r, id)).localCheckpoint(true)
          current.unpersist()
          current = next
          merges += Merge(l, r, id, cnt)
          nextId += 1
        case _ => done = true
      }
    }
    (merges.toSeq, current)
  }

  /** Simultaneous rewrite of a batch of TOKEN-DISJOINT pairs in one greedy
    * left-to-right pass. Disjointness makes this equal to applying the
    * pairs' [[mergeOnce]] rewrites sequentially in any order: two disjoint
    * pairs cannot match overlapping positions (an overlap would need a
    * shared token at the overlapping slot), and replacing `ab → X` neither
    * creates nor destroys an adjacency of tokens outside {a,b}. */
  def mergeBatch(seq: Array[Int], pairMap: Map[Long, Int]): Array[Int] = {
    if (seq.length < 2 || pairMap.isEmpty) return seq
    val out = new scala.collection.mutable.ArrayBuffer[Int](seq.length)
    var i = 0
    while (i < seq.length) {
      val id =
        if (i + 1 < seq.length)
          pairMap.getOrElse(packPair(seq(i), seq(i + 1)), -1)
        else -1
      if (id >= 0) { out += id; i += 2 } else { out += seq(i); i += 1 }
    }
    out.toArray
  }

  /** Batched trainer: learns the SAME merge table as [[train]] in ~k× fewer
    * Spark rounds (one driver round-trip per merge means a 32k-merge vocab
    * is 32k jobs on the sequential path — VERDICT r3 #6).
    *
    * Per round, the top `batchK + 1` candidates are fetched (count desc,
    * key asc — the sequential tiebreak) and the batch is the maximal SORTED
    * PREFIX of pairwise token-disjoint pairs, truncated to those whose
    * count STRICTLY exceeds the cutoff (the first skipped non-disjoint
    * candidate, or the fetch-boundary sentinel). That rule makes the batch
    * provably order-equivalent to sequential merging:
    *  - disjoint pairs' counts are invariant under each other's merges, so
    *    each selected pair still holds its recorded count when sequential
    *    training would reach it;
    *  - any pair a selected merge CREATES (`(x,Xi)`, `(Xi,y)`, `(Xi,Xj)`,
    *    `(Xi,Xi)`) is count-bounded by an OLD pair sharing a token with
    *    that merge — and every such old pair either stopped the prefix (so
    *    its count IS the cutoff) or sorts at/below the cutoff, so no
    *    created pair can outrank a batch member that strictly beats the
    *    cutoff;
    *  - equal-count ties sort by key, and every unselected old pair with a
    *    batch member's count sorts after it (or the walk would have
    *    selected/stopped on it first).
    * When the strict filter empties the batch (an all-ties round) the
    * round degrades to the sequential single-merge step, which is always
    * sound. BpeTrainerSpec asserts table identity against [[train]] across
    * fixture + fuzz corpora and counts the Spark jobs saved. */
  def trainBatched(seqs: Dataset[Array[Int]], nMerges: Int,
                   minCount: Long = 2L, batchK: Int = 16): (Seq[Merge], Dataset[Array[Int]]) = {
    val spark = seqs.sparkSession
    import spark.implicits._
    var current = seqs.persist(StorageLevel.MEMORY_AND_DISK)
    var nextId = seedNextId(current)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < nMerges && !done) {
      val want = math.min(batchK, nMerges - merges.length)
      val cand = rankedPairCounts(current)
        .filter(org.apache.spark.sql.functions.col("count") >= minCount)
        .limit(want + 1).as[(Long, Long)].collect()
      if (cand.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[Int]
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var cutoff = Long.MinValue
        var i = 0
        var stopped = false
        while (i < cand.length && !stopped && selected.length < want) {
          val (key, cnt) = cand(i)
          val (l, r) = ((key >> 32).toInt, key.toInt)
          if (used(l) || used(r)) { cutoff = cnt; stopped = true }
          else { selected += ((key, cnt)); used += l; used += r }
          i += 1
        }
        if (!stopped && i < cand.length) cutoff = cand(i)._2 // fetch boundary
        var batch = selected.filter(_._2 > cutoff).toSeq
        if (batch.isEmpty) batch = selected.take(1).toSeq // all-ties round
        val pairMap = batch.zipWithIndex.map { case ((key, _), j) =>
          key -> (nextId + j)
        }.toMap
        // eager localCheckpoint — see [[train]]: truncates plan + lineage
        val next = current.map(mergeBatch(_, pairMap)).localCheckpoint(true)
        current.unpersist()
        current = next
        batch.foreach { case (key, cnt) =>
          merges += Merge((key >> 32).toInt, key.toInt, nextId, cnt)
          nextId += 1
        }
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

  /** The detokenizer side: recursively expand merge ids back to base
    * tokens. Inverse of [[applyMerges]] by construction — every merge id
    * maps to exactly one (left, right) pair, so expansion is unambiguous
    * regardless of merge order. Iterative stack walk (a 32k-merge chain
    * could overflow the call stack on a pathological corpus). */
  def unmerge(seq: Array[Int], merges: Seq[Merge]): Array[Int] =
    unmergeWith(seq, expansionTable(merges))

  /** Prebuilt expansion table for [[unmergeWith]] — build ONCE per merge
    * table, not per row: a 32k-merge vocab rebuilt per document is a
    * 32k-entry HashMap allocation on every row of the corpus. */
  def expansionTable(merges: Seq[Merge]): Map[Int, (Int, Int)] =
    merges.map(m => m.newId -> ((m.left, m.right))).toMap

  def unmergeWith(seq: Array[Int], exp: Map[Int, (Int, Int)]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](seq.length * 2)
    val stack = new scala.collection.mutable.ArrayStack[Int]()
    seq.foreach { t0 =>
      stack.push(t0)
      while (stack.nonEmpty) {
        val t = stack.pop()
        exp.get(t) match {
          case Some((l, r)) => stack.push(r); stack.push(l)
          case None => out += t
        }
      }
    }
    out.toArray
  }

  /** End-to-end tokenizer audit over the `documents` table: train a merge
    * table on the corpus' code-point sequences, encode every document,
    * expand back, and report `(n_docs, n_ok, orig_tokens)` where `n_ok`
    * counts documents whose decode is byte-identical to the original —
    * the invariant the oracle pins to `count(*)` (a single dropped or
    * duplicated token anywhere in train/apply/unmerge breaks it). One
    * narrow map pass per document at apply time; the merge table rides in
    * the closure (vocab-sized, not corpus-sized). */
  def roundTripAudit(spark: SparkSession, dir: String,
                     nMerges: Int = 16): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val seqs = docs.select("text").as[String].map(graft.functions.TokenCodec.encodeString)
    val (merges, trained) = trainBatched(seqs, nMerges)
    // the trainer's working corpus is persisted/checkpointed for the merge
    // loop only — release it, or it squats executor storage for the whole
    // session (Verify runs ~60 queries in one session)
    trained.unpersist(blocking = false)
    val exp = expansionTable(merges) // built once, rides the closure
    import org.apache.spark.sql.functions.{count, lit, sum}
    docs.as[(Long, String)].map { case (_, text) =>
      val orig = graft.functions.TokenCodec.encodeString(text)
      val enc = applyMerges(orig, merges)
      val ok = java.util.Arrays.equals(unmergeWith(enc, exp), orig)
      (orig.length.toLong, enc.length.toLong, if (ok) 1L else 0L)
    }.toDF("orig", "enc", "ok")
      .agg(count(lit(1)).as("n_docs"), sum("ok").as("n_ok"),
        sum("orig").cast("long").as("orig_tokens"))
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
