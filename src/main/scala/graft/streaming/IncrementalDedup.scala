package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextOps}

/** Incremental near-dup cluster maintenance for a STREAMING corpus — the
  * piece batch [[CorpusOps.dupClusters]] cannot provide: its label cache
  * assumes an immutable snapshot, so a growing corpus would re-run LSH +
  * connected components over ALL documents every microbatch (O(corpus) work
  * per batch — a non-starter when the corpus is 100 TB and the batch is
  * 1 GB).
  *
  * Per microbatch of new documents this maintains three state tables and
  * touches ONLY batch-proportional data:
  *
  *  1. candidate pairs: the batch's LSH band buckets ([[TextOps.bandBuckets]]
  *     — the same single banding definition as the batch path) self-joined
  *     (new↔new) and equi-joined against the persistent band index
  *     (new↔existing). Band equi-joins, never a scan of old documents.
  *  2. exact-Jaccard verification of candidates only (shingle sets fetched
  *     by id equi-join — AQE broadcasts the candidate side).
  *  3. cluster merge WITHOUT whole-corpus connected components: every
  *     existing endpoint is COLLAPSED to its current cluster representative
  *     (unlabelled docs represent themselves), and the contraction runs on
  *     that collapsed graph — its node set is (batch docs ∪ touched reps),
  *     never the corpus. Because each stored rep is the minimum doc_id of
  *     its component, the collapsed component minimum IS the full component
  *     minimum, so relabelling `rep → new_rep` by equi-join reproduces
  *     exactly the labels a from-scratch [[CorpusOps.connectedComponents]]
  *     over the union corpus would emit (StreamingSpec asserts parity, and
  *     that the contraction's node count stayed batch-sized).
  *
  * New docs bridging two existing clusters merge them (both reps re-point at
  * the smaller); docs with no near-dup get no label row, matching the batch
  * semantics. Upstream must feed each doc_id exactly once (the streaming
  * tier's exact dedup / `dropDuplicatesWithinWatermark` gate does this).
  *
  * State: the band index (doc_id, band, bkey) and shingle store (doc_id,
  * sh) are APPEND-ONLY delta vectors — each batch contributes one eagerly
  * checkpointed leaf, so maintaining them costs O(batch), never a rewrite
  * of accumulated state; a read is the union of materialized leaves (at
  * cluster scale: parquet appends to a lake table). The label table
  * (doc_id, rep) is the one in-place-mutating state — label-sized,
  * rewritten only on batches that produce pairs, replaced generations
  * unpersisted. The shingle store is the one corpus-proportional column;
  * it is only ever READ through an id equi-join against candidate ids, so
  * a lake-resident copy joins partition-pruned at scale.
  */
class IncrementalDedup(threshold: Double = 0.5, k: Int = 3) {

  // Band index and shingle store are APPEND-ONLY: state is a vector of
  // per-batch checkpointed deltas, and a read is their union — each leaf is
  // already materialized, so appending a batch costs O(batch), never a
  // rewrite of the accumulated corpus state (the first cut re-checkpointed
  // union(old, new) every batch — O(corpus) per microbatch, review r4 #4).
  // On a cluster these vectors ARE lake-table appends (one parquet append
  // per batch; compaction is the lake's background concern, cf.
  // [[LakeSink.compactInPlace]]'s tiered policy).
  private var bandDeltas: Vector[DataFrame] = Vector.empty  // (doc_id, band, bkey)
  private var shingleDeltas: Vector[DataFrame] = Vector.empty // (doc_id, sh)
  // The label table is the one state that mutates in place (reps re-point
  // on merges); it is label-sized, rewritten only on batches that produce
  // pairs, and the replaced generation is unpersisted. At scale this
  // becomes a merge-on-read delta in the lake.
  private var labelsState: Option[DataFrame] = None   // (doc_id, rep)

  private def bandsState: Option[DataFrame] = bandDeltas.reduceOption(_ union _)
  private def shinglesState: Option[DataFrame] = shingleDeltas.reduceOption(_ union _)

  /** Bound the union-plan width for long-lived in-memory sessions: past 64
    * leaves, fold the delta vectors into one checkpointed frame and free
    * the old blocks — amortized O(corpus/64) per batch, plan width ≤ 64.
    * (The lake-table deployment doesn't need this: there the "union" is a
    * file listing and compaction is the sink's tiered background job.) */
  private def compactIfWide(): Unit = if (bandDeltas.size >= 64) {
    val b = bandDeltas.reduce(_ union _).localCheckpoint(true)
    val s = shingleDeltas.reduce(_ union _).localCheckpoint(true)
    (bandDeltas ++ shingleDeltas).foreach(release)
    bandDeltas = Vector(b)
    shingleDeltas = Vector(s)
  }

  /** Dead checkpointed generation → free its executor-storage blocks NOW.
    * `df.unpersist()` alone does not release localCheckpoint RDD blocks
    * (they wait for ContextCleaner GC); the bridge unpersists the
    * underlying checkpoint RDD itself (review r4 ADVICE). */
  private def release(df: DataFrame): Unit =
    try { org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(df) }
    catch { case _: Exception => () }

  import IncrementalDedup.BatchStats

  /** Current labels `(doc_id, rep)` — same shape + semantics as
    * [[CorpusOps.dupClusters]] over the union of all batches so far. */
  def labels: DataFrame =
    labelsState.getOrElse(
      throw new IllegalStateException("no batch ingested yet"))

  /** Ingest one microbatch `(doc_id, text)`; returns audit stats. Call from
    * `foreachBatch` (idempotent replay belongs to the caller's sink
    * protocol: replaying a batch would double-insert band rows, so gate on
    * batchId like [[LakeSink]] does). */
  def addBatch(batch: DataFrame): BatchStats = {
    val newShingles = batch
      .select(col("doc_id"), TextOps.shingleArr(col("text"), k).as("sh"))
      .localCheckpoint(true)
    val nNew = newShingles.count()
    val newBands = TextOps.bandBuckets(newShingles).localCheckpoint(true)

    // candidates: new↔new (self-join, i<j) plus new↔existing (index join)
    val newNew = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val newOld = bandsState match {
      case Some(idx) => idx.as("o").join(newBands.as("n"),
          col("o.band") === col("n.band") && col("o.bkey") === col("n.bkey"))
        .select(col("o.doc_id").as("id_a"), col("n.doc_id").as("id_b"))
      case None => newNew.limit(0)
    }
    val cands = newNew.union(newOld).distinct().localCheckpoint(true)
    val nCands = cands.count()

    // exact-Jaccard verification — candidate ids only, via id equi-join
    val allSh = shinglesState.fold(newShingles)(_.union(newShingles))
    val verified = cands
      .join(allSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      // round(,6) BEFORE the threshold compare — identical to the batch
      // path, so a boundary pair never flips between the two
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b").localCheckpoint(true)
    val nVerified = verified.count()

    var nNodes = 0L
    var nTouched = 0L
    var rounds = 0
    // batch-scoped checkpoints (candidates, verified pairs, contraction
    // graph, component labels) are dead once the batch commits — released
    // before returning so a long-lived session's storage is deltas + labels
    // only, not scratch from every batch ever processed
    val scratch = scala.collection.mutable.ArrayBuffer[DataFrame](cands, verified)
    if (nVerified > 0) {
      // collapse existing endpoints to their current reps (docs without a
      // label row — new docs and old singletons — represent themselves)
      val collapsed = labelsState.fold(verified) { lbl =>
        verified
          .join(lbl.select(col("doc_id").as("id_a"), col("rep").as("rep_a")),
            Seq("id_a"), "left")
          .join(lbl.select(col("doc_id").as("id_b"), col("rep").as("rep_b")),
            Seq("id_b"), "left")
          .select(coalesce(col("rep_a"), col("id_a")).as("id_a"),
            coalesce(col("rep_b"), col("id_b")).as("id_b"))
      }.filter(col("id_a") =!= col("id_b")).distinct().localCheckpoint(true)
      scratch += collapsed
      nNodes = collapsed.select(explode(array(col("id_a"), col("id_b"))))
        .distinct().count()

      if (nNodes > 0) {
        val (comp0, it) =
          CorpusOps.connectedComponentsWithRounds(collapsed)
        rounds = it
        val comp = comp0.toDF("node", "new_rep").localCheckpoint(true)
        scratch += comp
        nTouched = labelsState.fold(0L)(lbl =>
          comp.join(lbl.select(col("rep").as("node")).distinct(), Seq("node"))
            .count())
        // patch the label table: rows of touched clusters re-point at the
        // merged rep; contraction nodes without a label row get fresh rows
        val nextLabels = labelsState match {
          case Some(lbl) =>
            val updated = lbl
              .join(comp.withColumnRenamed("node", "rep"), Seq("rep"), "left")
              .select(col("doc_id"),
                coalesce(col("new_rep"), col("rep")).as("rep"))
            val fresh = comp
              .join(lbl.select("doc_id"), col("node") === col("doc_id"),
                "left_anti")
              .select(col("node").as("doc_id"), col("new_rep").as("rep"))
            updated.union(fresh)
          case None =>
            comp.select(col("node").as("doc_id"), col("new_rep").as("rep"))
        }
        val prev = labelsState
        labelsState = Some(nextLabels.localCheckpoint(true))
        // the replaced generation's checkpoint blocks are dead — drop them
        prev.foreach(release)
      }
    } else if (labelsState.isEmpty && nNew > 0) {
      // schema-stable empty label table so `labels` is callable after any
      // ingested batch, pair-less or not
      labelsState = Some(newShingles.select(col("doc_id"),
        col("doc_id").as("rep")).limit(0).localCheckpoint(true))
    }

    // append the batch's (already checkpointed) deltas — O(batch)
    if (nNew > 0) {
      bandDeltas :+= newBands
      shingleDeltas :+= newShingles
      compactIfWide()
    }
    scratch.foreach(release)
    BatchStats(nNew, nCands, nVerified, nNodes, nTouched, rounds)
  }
}

object IncrementalDedup {
  /** Audit metrics of one batch — the spec's evidence that the merge stayed
    * batch-proportional. */
  final case class BatchStats(
      nNewDocs: Long, nCandidatePairs: Long, nVerifiedPairs: Long,
      nGraphNodes: Long, nTouchedReps: Long, ccRounds: Int)

  /** Batch-shaped driver for the ORACLE GATE (`q_dup_clusters_incremental`):
    * replays the documents table as `nChunks` microbatches (doc_id mod
    * chunking — arrival order must not matter) through a fresh
    * [[IncrementalDedup]] and returns the final labels. The DuckDB oracle
    * is the SAME recursive-CTE connected-components query that checks
    * [[graft.operators.CorpusOps.dupClusters]]: the hard correctness signal
    * that incremental maintenance converges to exactly the batch answer on
    * real data, not just the spec fixture. */
  def replayClusters(spark: org.apache.spark.sql.SparkSession, dir: String,
                     threshold: Double = 0.5, nChunks: Int = 3): DataFrame = {
    val docs = graft.operators.TextOps.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val inc = new IncrementalDedup(threshold)
    (0 until nChunks).foreach { c =>
      inc.addBatch(docs.filter(pmod(col("doc_id"), lit(nChunks)) === c))
    }
    inc.labels
  }
}
