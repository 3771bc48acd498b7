package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *     that the contraction's node set stayed batch-sized).
  *
  * New docs bridging two existing clusters merge them (both reps re-point at
  * the smaller); docs with no near-dup get no label row, matching the batch
  * semantics. Upstream must feed each doc_id exactly once (the streaming
  * tier's exact dedup / `dropDuplicatesWithinWatermark` gate does this).
  *
  * Two deployments share the three stages (companion helpers):
  * [[IncrementalDedup]] keeps state in session-local checkpointed frames
  * (fastest; dies with the driver) and [[DurableIncrementalDedup]] writes
  * every state table through [[LakeSink]] — crash-atomic manifest commits,
  * idempotent batch replay, and a driver restart rebuilds from the lake
  * with label parity (StreamingSpec kill/restart test).
  */
class IncrementalDedup(threshold: Double = 0.5, k: Int = 3) {

  import IncrementalDedup._

  // Band index and shingle store are APPEND-ONLY: state is a vector of
  // per-batch checkpointed deltas, and a read is their union — each leaf is
  // already materialized, so appending a batch costs O(batch), never a
  // rewrite of the accumulated corpus state (the first cut re-checkpointed
  // union(old, new) every batch — O(corpus) per microbatch, review r4 #4).
  // On a cluster these vectors ARE lake-table appends — that deployment is
  // [[DurableIncrementalDedup]].
  private var bandDeltas: Vector[DataFrame] = Vector.empty  // (doc_id, band, bkey)
  private var shingleDeltas: Vector[DataFrame] = Vector.empty // (doc_id, sh)
  // The label table is the one state that mutates in place (reps re-point
  // on merges); it is label-sized, rewritten only on batches that produce
  // pairs, and the replaced generation is unpersisted.
  private var labelsState: Option[DataFrame] = None   // (doc_id, rep)

  private def bandsState: Option[DataFrame] = bandDeltas.reduceOption(_ union _)
  private def shinglesState: Option[DataFrame] = shingleDeltas.reduceOption(_ union _)

  /** Bound the union-plan width for long-lived in-memory sessions: past 64
    * leaves, fold the delta vectors into one checkpointed frame and free
    * the old blocks — amortized O(corpus/64) per batch, plan width ≤ 64.
    * (The lake deployment doesn't need this: there the "union" is a file
    * listing and compaction is the sink's tiered background job.) */
  private def compactIfWide(): Unit = if (bandDeltas.size >= 64) {
    val b = bandDeltas.reduce(_ union _).localCheckpoint(true)
    val s = shingleDeltas.reduce(_ union _).localCheckpoint(true)
    (bandDeltas ++ shingleDeltas).foreach(release)
    bandDeltas = Vector(b)
    shingleDeltas = Vector(s)
  }

  /** Current labels `(doc_id, rep)` — same shape + semantics as
    * [[CorpusOps.dupClusters]] over the union of all batches so far.
    *
    * Validity window: the frame is a live view of the CURRENT generation.
    * The next label-changing `addBatch` releases that generation's
    * checkpoint blocks (locally-checkpointed lineage cannot recompute), so
    * a handle held across batches throws on evaluation — materialize
    * (collect / write / cache-and-count) before ingesting further. */
  def labels: DataFrame =
    labelsState.getOrElse(
      throw new IllegalStateException("no batch ingested yet"))

  /** Ingest one microbatch `(doc_id, text)`; returns audit stats. Call from
    * `foreachBatch` (idempotent replay belongs to the caller's sink
    * protocol: replaying a batch would double-insert band rows, so gate on
    * batchId like [[LakeSink]] does — or use [[DurableIncrementalDedup]],
    * which gates internally). */
  def addBatch(batch: DataFrame): BatchStats = {
    // LAZY checkpoint + count = one materialization job, not two (eager
    // checkpoint then count) — safe wherever nothing in the lineage is
    // released before the count runs
    val (newShingles, nNew) = labeled(batch, "dedup: shingle batch") {
      val df = shinglesOf(batch, k).localCheckpoint()
      (df, df.count()) }
    // EAGER on purpose: the candidate self-join reads this table on three
    // legs — a lazy checkpoint would recompute the signature pass per leg
    // inside the candidate+verify job (measured a wash at best), while the
    // eager job computes it exactly once
    val newBands = labeled(batch, "dedup: band batch") {
      TextOps.bandBuckets(newShingles).localCheckpoint(true) }

    // candidates + verification materialize as ONE checkpoint of the
    // candidate-sized scored frame (jaccard-threshold flag kept, not yet
    // filtered) — the separate candidate checkpoint bought only the nCands
    // stat, which the scored frame still carries; one fewer materialized
    // frame ≈ 3-4 fewer scheduled jobs per microbatch. Both stats come from
    // the SAME materializing aggregate (count + conditional count), erasing
    // the separate verified.count() job.
    val allSh = shinglesState.fold(newShingles)(_.union(newShingles))
    val (scored, nCands, nVerified) = labeled(batch, "dedup: candidate+verify") {
      val df = scoredPairs(candidatePairs(newBands, bandsState), allSh,
        threshold).localCheckpoint()
      val s = df.agg(count(lit(1)), count(when(col("ok"), true))).head()
      (df, s.getLong(0), s.getLong(1)) }
    val verified = scored.filter(col("ok")).select("id_a", "id_b")

    var nNodes = 0L
    var nTouched = 0L
    var rounds = 0
    // batch-scoped checkpoints (candidates, verified pairs, contraction
    // graph, component labels) are dead once the batch commits — released
    // before returning so a long-lived session's storage is deltas + labels
    // only, not scratch from every batch ever processed
    val scratch = scala.collection.mutable.ArrayBuffer[DataFrame](scored)
    if (nVerified > 0) {
      labeled(batch, "dedup: label merge")(labelMerge(verified, labelsState)) match {
        case Some(m) =>
          nNodes = m.nNodes; nTouched = touchedReps(m.comp, labelsState)
          rounds = m.ccRounds
          val prev = labelsState
          labelsState = Some(labeled(batch, "dedup: label merge") {
            m.nextLabels.localCheckpoint(true) })
          scratch ++= m.scratch
          // the replaced generation's checkpoint blocks are dead — drop them
          prev.foreach(release)
        case None => ()
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
    } else {
      // empty microbatch (idle stream tick): the two checkpoints were
      // never appended, so they are scratch — without this, every empty
      // batch leaks two orphaned RDDs for the session lifetime
      scratch += newBands
      scratch += newShingles
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

  /** Label the jobs of one phase (guide §1.5) — thread-local; restores the
    * caller's description (structured streaming sets its own per
    * microbatch) rather than clearing it. */
  private[streaming] def labeled[T](df: DataFrame, desc: String)(body: => T): T = {
    val sc = df.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Dead checkpointed generation → free its executor-storage blocks NOW.
    * `df.unpersist()` alone does not release localCheckpoint RDD blocks
    * (they wait for ContextCleaner GC); the bridge unpersists the
    * underlying checkpoint RDD itself (review r4 ADVICE). */
  private[graft] def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpointQuietly(df)

  private[streaming] def shinglesOf(batch: DataFrame, k: Int): DataFrame =
    // fan the batch out before shingling: a batch carved from a one-file
    // scan (the replay drivers) or a few-file trigger plans as 1-4 tasks,
    // serializing the per-row shingle+minhash work; no-op when the batch
    // already has session-parallelism partitions (Par.fanOut)
    graft.operators.Par.fanOut(batch, col("doc_id"))
      .select(col("doc_id"), TextOps.shingleArr(col("text"), k).as("sh"))

  /** Candidates: new↔new (band self-join, i<j) plus new↔existing (band
    * index equi-join) — never a scan of old documents. The new↔old side
    * drops self-pairs (`o.doc_id =!= n.doc_id` — harmless in normal
    * operation where old and new ids are disjoint, load-bearing on durable
    * replay where the crashed batch's own bands are already in the index)
    * and is normalized to (least, greatest) so a replay-induced reversed
    * pair lands on the same row the self-join emitted and `distinct()`
    * genuinely absorbs it — keeping the nCandidatePairs/nVerifiedPairs
    * audit stats exact under redelivery, not just the labels (r5 ADVICE). */
  private[streaming] def candidatePairs(newBands: DataFrame,
                                        bandsState: Option[DataFrame]): DataFrame = {
    val newNew = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val newOld = bandsState match {
      case Some(idx) => idx.as("o").join(newBands.as("n"),
          col("o.band") === col("n.band") && col("o.bkey") === col("n.bkey") &&
            col("o.doc_id") =!= col("n.doc_id"))
        .select(least(col("o.doc_id"), col("n.doc_id")).as("id_a"),
          greatest(col("o.doc_id"), col("n.doc_id")).as("id_b"))
      case None => newNew.limit(0)
    }
    newNew.union(newOld).distinct()
  }

  /** Exact-Jaccard scoring of every candidate — candidate ids only, via id
    * equi-join; emits `(id_a, id_b, ok)` with the threshold verdict as a
    * flag instead of a filter, so ONE candidate-sized materialization
    * serves both the nCandidatePairs stat and the verified set.
    * round(,6) BEFORE the threshold compare — identical to the batch path,
    * so a boundary pair never flips between the two. */
  private[streaming] def scoredPairs(cands: DataFrame, allSh: DataFrame,
                                     threshold: Double): DataFrame =
    cands
      .join(allSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6) >= threshold).as("ok"))

  /** Result of the rep-collapsed contraction: `nextLabels` is a PLAN
    * (caller materializes — checkpoint or lake write), `comp` and `scratch`
    * are checkpointed batch-scoped frames the caller must [[release]] after
    * materializing `nextLabels`. */
  private[streaming] final case class LabelMerge(
      nextLabels: DataFrame, comp: DataFrame, scratch: Seq[DataFrame],
      nNodes: Long, ccRounds: Int)

  /** Collapse verified-pair endpoints to their current reps, run connected
    * components on the batch-sized contraction, and patch the label table.
    * None when the collapsed graph is empty (all pairs internal to existing
    * clusters). */
  private[streaming] def labelMerge(verified: DataFrame,
                                    labelsState: Option[DataFrame]): Option[LabelMerge] = {
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
    }.filter(col("id_a") =!= col("id_b")).distinct()
      .localCheckpoint() // lazy: the count below materializes it — 1 job
    // the contraction graph is batch-sized BY CONSTRUCTION (endpoints are
    // batch docs ∪ touched reps — the property StreamingSpec asserts), so
    // its node count and components come from ONE bounded collect + driver
    // union-find instead of a distinct-count job plus the CC job chain
    // (~8 scheduled jobs per microbatch on sub-second data). Graphs past
    // the same bound the CC hybrid uses fall back to the distributed loop.
    // 2^18 edges ≈ 4 MB collected, ≤ ~0.5M-node LocalRelation — small
    // enough to ride plans as a broadcast; past it, the distributed loop
    val localLimit = 1L << 18
    val nEdges = collapsed.count()
    val longIds = collapsed.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (nEdges == 0) { release(collapsed); None }
    else if (nEdges <= localLimit && longIds) {
      val spark = collapsed.sparkSession
      import spark.implicits._
      val edges = collapsed.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = new java.util.HashMap[Long, Long](edges.length * 2)
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val nodes = edges.iterator.flatMap { case (a, b) => Iterator(a, b) }
        .toArray.distinct
      // LocalRelation — joins against it broadcast; nothing to release
      val comp = nodes.map(v => (v, find(v))).toSeq.toDF("node", "new_rep")
      val nextLabels = patchLabels(comp, labelsState)
      Some(LabelMerge(nextLabels, comp, Seq(collapsed), nodes.length.toLong, 0))
    } else {
      val nNodes = collapsed.select(explode(array(col("id_a"), col("id_b"))))
        .distinct().count()
      val (comp0, rounds) = CorpusOps.connectedComponentsWithRounds(collapsed)
      val comp = comp0.toDF("node", "new_rep").localCheckpoint(true)
      Some(LabelMerge(patchLabels(comp, labelsState), comp,
        Seq(collapsed, comp), nNodes, rounds))
    }
  }

  /** Patch the label table: rows of touched clusters re-point at the merged
    * rep; contraction nodes without a label row get fresh rows. */
  private def patchLabels(comp: DataFrame,
                          labelsState: Option[DataFrame]): DataFrame =
    labelsState match {
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

  private[streaming] def touchedReps(comp: DataFrame,
                                     labelsState: Option[DataFrame]): Long =
    labelsState.fold(0L)(lbl =>
      comp.join(lbl.select(col("rep").as("node")).distinct(), Seq("node"))
        .count())

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

  /** The lake-backed twin of [[replayClusters]] — same oracle contract,
    * state flowing through [[DurableIncrementalDedup]]'s LakeSinks (the
    * optional durable path for `q_dup_clusters_incremental`). */
  def replayClustersDurable(spark: SparkSession, dir: String, lakePath: String,
                            threshold: Double = 0.5, nChunks: Int = 3): DataFrame = {
    val docs = graft.operators.TextOps.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val inc = new DurableIncrementalDedup(spark, lakePath, threshold)
    (0 until nChunks).foreach { c =>
      inc.addBatch(c.toLong, docs.filter(pmod(col("doc_id"), lit(nChunks)) === c))
    }
    inc.labels
  }
}

/** Restart-durable incremental near-dup maintenance: the same three stages
  * as [[IncrementalDedup]], with every state table written through
  * [[LakeSink]] — band/shingle deltas as append-only batch commits, the
  * label table as one full generation per label-changing batch. A driver
  * restart loses NOTHING: a new instance over the same `lakePath` reads the
  * committed manifests and continues (StreamingSpec asserts label parity
  * between an interrupted and an uninterrupted run — VERDICT r4
  * prescription #2).
  *
  * Replay protocol (crash anywhere, re-deliver the batch):
  * commit ORDER is labels → bands → shingles, and the SHINGLE commit is the
  * batch's completion marker —
  *  - shingles committed → the whole batch landed → replay is a no-op;
  *  - labels committed but bands/shingles not → the label recompute is
  *    skipped (its gen is the marker) and the deterministic band/shingle
  *    deltas are recomputed from the batch and committed (LakeSink's own
  *    accountsFor gate makes each idempotent);
  *  - crash before the labels commit → full recompute. The recompute is
  *    consistent even when the crashed batch's bands ARE already committed
  *    (possible only for batches that changed no labels): the new↔old join
  *    then re-yields the batch's own pairs, but self-pairs are filtered at
  *    the join and cross-pairs are normalized to (least, greatest) before
  *    `distinct()`, so they collapse onto the new↔new self-join's rows —
  *    labels AND audit stats match the uncrashed run exactly.
  *
  * Read amplification note: each batch reads the band index and shingle
  * store from parquet instead of session-cached frames — the price of
  * restart durability without an index service. Both reads are equi-join
  * probes (band keys, candidate ids), so at cluster scale they are
  * column-pruned scans that AQE keeps on the small side of each join; the
  * in-memory class remains the right choice for single-session audits
  * (`q_dup_clusters_incremental` default). */
class DurableIncrementalDedup(spark: SparkSession, lakePath: String,
                              threshold: Double = 0.5, k: Int = 3) {

  import IncrementalDedup._

  private val bandSink = new LakeSink(s"$lakePath/bands")
  private val shingleSink = new LakeSink(s"$lakePath/shingles")
  private val labelSink = new LakeSink(s"$lakePath/labels")

  private def strip(df: DataFrame): DataFrame = df.drop("_batch_id", "_part_id")

  private def readState(sink: LakeSink): Option[DataFrame] =
    if (sink.committed().exists(_.rows > 0)) Some(strip(sink.readUniform(spark)))
    else None

  /** Newest committed label generation, read from its ONE segment dir —
    * never the whole history filtered back down (each label-changing batch
    * commits a full table; reading all generations to keep one would be
    * O(history) I/O per call). The label sink is generation-snapshot, so
    * compaction must never run on it: readGeneration fails loudly if the
    * newest segment was folded, and the negative-id guard catches a
    * compacted manifest before max() would select the fold segment. */
  private def latestLabelGen(): Option[DataFrame] = {
    val gens = labelSink.committed()
    require(gens.forall(_.batch >= 0),
      "label sink was compacted — generation-snapshot semantics are gone")
    if (gens.isEmpty) None
    else Some(strip(labelSink.readGeneration(spark, gens.map(_.batch).max)))
  }

  /** Current labels: the newest committed generation (empty frame with the
    * right schema when no batch has produced pairs yet). */
  def labels: DataFrame = {
    require(shingleSink.committed().nonEmpty, "no batch ingested yet")
    latestLabelGen().getOrElse(
      spark.range(0).select(col("id").as("doc_id"), col("id").as("rep")))
  }

  /** Ingest one microbatch `(doc_id, text)` under the replay protocol
    * above. Safe to call again with the same `batchId` after any crash —
    * exactly-once state, like the [[LakeSink]] data path itself. */
  def addBatch(batchId: Long, batch: DataFrame): BatchStats = {
    if (shingleSink.accountsFor(batchId)) // completion marker → replay no-op
      return BatchStats(0L, 0L, 0L, 0L, 0L, 0)
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val (newShingles, nNew) = labeled(batch, "durdedup: shingle batch") {
      val df = shinglesOf(batch, k).localCheckpoint() // lazy + count: 1 job
      (df, df.count()) }
    // EAGER (the in-memory twin's rationale): three join legs read it
    val newBands = labeled(batch, "durdedup: band batch") {
      TextOps.bandBuckets(newShingles).localCheckpoint(true) }
    scratch += newShingles
    scratch += newBands
    var stats = BatchStats(nNew, 0L, 0L, 0L, 0L, 0)
    if (!labelSink.accountsFor(batchId)) {
      // one candidate-sized materialization for candidates AND verification
      // (the scoredPairs rationale in the in-memory twin); both stats from
      // the one materializing aggregate
      val allSh = readState(shingleSink).fold(newShingles)(_.union(newShingles))
      val (scored, nCands, nVerified) = labeled(batch, "durdedup: candidate+verify") {
        val df = scoredPairs(candidatePairs(newBands, readState(bandSink)),
          allSh, threshold).localCheckpoint() // lazy + agg: 1 job
        val s = df.agg(count(lit(1)), count(when(col("ok"), true))).head()
        (df, s.getLong(0), s.getLong(1)) }
      scratch += scored
      val verified = scored.filter(col("ok")).select("id_a", "id_b")
      stats = stats.copy(nCandidatePairs = nCands, nVerifiedPairs = nVerified)
      if (nVerified > 0) {
        val labelsState = latestLabelGen()
        labeled(batch, "durdedup: label merge")(labelMerge(verified, labelsState))
          .foreach { m =>
          stats = stats.copy(nGraphNodes = m.nNodes,
            nTouchedReps = touchedReps(m.comp, labelsState), ccRounds = m.ccRounds)
          // full current table = this generation's rows; the manifest
          // commit is atomic, so a crash mid-write never becomes "current"
          labeled(batch, "durdedup: commit labels") {
            labelSink.addBatch(batchId, m.nextLabels) }
          scratch ++= m.scratch
        }
      }
    }
    // deltas last: the shingle commit marks the batch complete
    labeled(batch, "durdedup: commit bands") {
      bandSink.addBatch(batchId, newBands) }
    labeled(batch, "durdedup: commit shingles") {
      shingleSink.addBatch(batchId, newShingles) }
    scratch.foreach(release)
    stats
  }
}
