package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Two-phase per-group top-k: a bounded typed Aggregator replacing the
  * `row_number() over (partition by qid order by sim desc)` window that
  * every top-k tail used through r4. The window shape sorts a
  * CORPUS-SIZED partition per query (all candidate rows of one qid land on
  * one task before a single row can rank) — fine at test sf, a skew hazard
  * the moment a brute/ground-truth path runs at scale. This aggregator
  * keeps at most k entries per (group × map task): partial aggregation
  * bounds the shuffle to numPartitions·k rows per query and the final
  * merge is a k-way sorted-list merge — no corpus-sized sort partition
  * anywhere (VERDICT r4 prescription #5).
  *
  * Ordering contract is IDENTICAL to the window it replaces: sim
  * descending, id ascending on ties — the output array is already in rank
  * order, so `posexplode` reproduces `rank = row_number()` exactly.
  * Associativity: the comparator is a total order on (sim, id), and
  * bounded top-k under a total order is associative + commutative, so
  * partial/merge scheduling cannot change the result. A typed Aggregator
  * via `udaf` stays inside ObjectHashAggregate (map-side combine, no
  * ScalaUDF in the plan — the PlanSpec anti-pattern gates still hold).
  *
  * The buffer is a best-first sorted List bounded at k: reduce is O(1) for
  * the common below-threshold row (one comparison against the current
  * k-th) and O(k) on insertion; k here is 5–256 (top-k or rerank width),
  * so the constant is small.
  */
object TopKAgg {

  final case class Scored(sim: Double, id: Long)

  final class Agg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private def beats(a: Scored, b: Scored): Boolean =
      a.sim > b.sim || (a.sim == b.sim && a.id < b.id)
    override def zero: List[Scored] = Nil
    override def reduce(buf: List[Scored], in: Scored): List[Scored] =
      if (buf.lengthCompare(k) >= 0 && !beats(in, buf.last)) buf
      else {
        val (before, after) = buf.span(beats(_, in))
        val merged = before ::: (in :: after)
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
      val out = List.newBuilder[Scored]
      var x = a
      var y = b
      var n = 0
      while (n < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
        n += 1
      }
      out.result()
    }
    override def finish(r: List[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** `topk(k, sim, id)` → `array<struct<sim,id>>` in rank order (best
    * first). Callers `posexplode` it: `pos + 1` IS the row_number. */
  def topk(k: Int, sim: Column, id: Column): Column =
    udaf(new Agg(k), ExpressionEncoder[Scored]()).apply(sim, id)
}
