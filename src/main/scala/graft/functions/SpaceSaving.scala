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
  * configuration. */
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
    val keys = a.counts.keySet ++ b.counts.keySet
    val summed = keys.toSeq.map { kw =>
      (kw, a.counts.getOrElse(kw, 0L) + b.counts.getOrElse(kw, 0L),
        a.errs.getOrElse(kw, 0L) + b.errs.getOrElse(kw, 0L))
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
