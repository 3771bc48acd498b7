package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch state: estimated counts plus the
  * per-key overestimation bound (the count the key inherited when it
  * evicted the previous minimum). */
case class SSBuf(counts: Map[String, Long], errs: Map[String, Long])

case class HeavyHitter(word: String, n: Long, err: Long)

/** SpaceSaving heavy hitters (Metwally et al. 2005) as a typed Spark
  * [[Aggregator]] — the CUSTOM-AGGREGATE extension point: partial sketches
  * build map-side, merge associatively at the shuffle (parallel
  * SpaceSaving, Agarwal et al. 2013: pointwise sum, then trim to capacity
  * keeping the largest), and only `capacity` entries of state ever exist
  * per group regardless of group size. This is the bounded-memory scale
  * path that exact top-k ([[graft.operators.CorpusOps.vocabTopK]]) lacks:
  * exact needs the full vocabulary shuffled; the sketch caps state at
  * `capacity` with the classic guarantees — every true count c is bounded
  * by estimate−err ≤ c ≤ estimate, and any key with c > N/capacity is
  * retained. With capacity ≥ distinct keys (the oracle configuration) no
  * eviction happens and the sketch IS the exact count map; eviction
  * behavior is spec-tested at small capacity.
  *
  * All tie-breaks (eviction victim, trim, final ranking) are (count, word)
  * lexicographic — deterministic across partitionings at the exact
  * configuration.
  *
  * Cost note: this immutable-Map formulation pays an O(capacity) argmin
  * scan per eviction (evictions dominate on a heavy-tail stream), which is
  * fine for the audit capacities shipped here (≤ 4096) but NOT the
  * asymptotic optimum — the production refinement is the Stream-Summary
  * linked-bucket structure (O(1) per update) carried in a custom-encoded
  * buffer; the merge/guarantee semantics above are unchanged by that
  * swap. */
class SpaceSaving(capacity: Int, k: Int)
    extends Aggregator[String, SSBuf, Seq[HeavyHitter]] {

  override def zero: SSBuf = SSBuf(Map.empty, Map.empty)

  override def reduce(b: SSBuf, w: String): SSBuf =
    b.counts.get(w) match {
      case Some(c) => b.copy(counts = b.counts.updated(w, c + 1))
      case None if b.counts.size < capacity =>
        SSBuf(b.counts.updated(w, 1L), b.errs.updated(w, 0L))
      case None =>
        // evict the (deterministic) minimum; the newcomer inherits its
        // count as the overestimation bound
        val (mw, mc) = b.counts.minBy { case (kw, c) => (c, kw) }
        SSBuf(b.counts - mw + (w -> (mc + 1)),
          b.errs - mw + (w -> mc))
    }

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    // Mergeable-summaries semantics (Agarwal et al. 2013): a SATURATED
    // sketch that lacks a key may still have absorbed up to min(counts) of
    // its mass through evictions, so the absent side contributes its
    // minimum count (as both estimate and error bound) — getOrElse(0)
    // there UNDERestimates and silently drops heavy keys evicted on one
    // partition (caught by review + the forced-eviction merge spec). A
    // non-saturated sketch's absence genuinely means zero.
    val minA = if (a.counts.size >= capacity) a.counts.values.min else 0L
    val minB = if (b.counts.size >= capacity) b.counts.values.min else 0L
    val keys = a.counts.keySet ++ b.counts.keySet
    val summed = keys.toSeq.map { kw =>
      val (ca, ea) = a.counts.get(kw)
        .map(c => (c, a.errs.getOrElse(kw, 0L))).getOrElse((minA, minA))
      val (cb, eb) = b.counts.get(kw)
        .map(c => (c, b.errs.getOrElse(kw, 0L))).getOrElse((minB, minB))
      (kw, ca + cb, ea + eb)
    }
    val kept =
      if (summed.size <= capacity) summed
      else summed.sortBy { case (kw, c, _) => (-c, kw) }.take(capacity)
    SSBuf(kept.map(t => t._1 -> t._2).toMap, kept.map(t => t._1 -> t._3).toMap)
  }

  override def finish(b: SSBuf): Seq[HeavyHitter] =
    b.counts.toSeq
      .map { case (w, c) => HeavyHitter(w, c, b.errs.getOrElse(w, 0L)) }
      .sortBy(h => (-h.n, h.word))
      .take(k)

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}
