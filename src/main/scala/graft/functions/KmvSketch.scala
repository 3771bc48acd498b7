package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values / bottom-k) distinct-count sketch (Bar-Yossef et
  * al. 2002; the Theta-sketch family's deterministic core): keep the k
  * smallest distinct 64-bit hashes of the inputs in UNSIGNED order. The
  * k-th smallest estimates the set's density — distinct ≈ (k−1)/frac(kth)
  * — and, unlike KLL or HLL register paths, the retained state is a pure
  * FUNCTION OF THE INPUT SET: the k smallest hashes are the k smallest
  * hashes no matter how the stream is partitioned or merged, so even the
  * small-k production dial is bit-deterministic across plans and replays.
  *
  * What it adds over the exact overlap matrix ([[TextOps.sourceSim]]):
  * SET OPERATIONS at sketch size. Union of two KMVs = KMV of the union
  * (merge, keep k smallest); intersection via inclusion-exclusion. At
  * 100 TB the per-source exact distinct-shingle sets are petabyte-scale
  * intermediates, while k sketches are catalog-sized rows a planner can
  * combine pairwise on the driver.
  *
  * Exactness: while a sketch holds fewer than k keys it IS the hashed set
  * (estimate = size, exact up to 64-bit hash collisions, p ≈ n²/2⁶⁵); the
  * oracle config sizes k above every per-source set AND every pairwise
  * union at the test scale factors, so union/intersection counts are
  * exact and hash-gated against DuckDB's exact distinct counts. The
  * production dial's relative error is pinned in KmvSpec.
  *
  * Buffer: mutable TreeSet, kryo-encoded (the [[SpaceSaving]] /
  * [[QuantileSketch]] pattern) — live object between reduce calls,
  * serialized only at shuffle boundaries; typed udaf keeps the plan
  * ScalaUDF-free. */
final class KmvBuf extends Serializable {
  /** Keys stored in unsigned order as signed longs: u = h ^ Long.MinValue
    * (flipping the sign bit maps unsigned comparison onto signed). */
  val keys = new java.util.TreeSet[java.lang.Long]()
  /** Cached k-th smallest (= keys.last) once at capacity: the hot path is
    * the reject — one primitive compare instead of an O(log k) last(). */
  private var threshold: Long = Long.MaxValue
  private var full: Boolean = false

  /** Single insert/cap/poll body for BOTH the reduce and merge paths —
    * diverging them would break the "k smallest are a function of the
    * input set" determinism KmvSpec asserts. */
  private def offerFlipped(u: Long, k: Int): Unit = {
    if (full && u >= threshold) return
    keys.add(u)
    if (keys.size > k) { keys.pollLast(); () }
    if (keys.size >= k) { full = true; threshold = keys.last() }
  }

  def offer(hash: Long, k: Int): Unit = offerFlipped(hash ^ Long.MinValue, k)

  def absorbKeys(other: java.util.TreeSet[java.lang.Long], k: Int): Unit = {
    val it = other.iterator()
    var go = true
    while (go && it.hasNext) {
      val u = it.next().longValue()
      // other is ascending: once one key can't qualify, none later can
      if (full && u >= threshold) go = false
      else offerFlipped(u, k)
    }
  }
}

object KmvSketch {

  final class Agg(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    override def zero: KmvBuf = new KmvBuf
    override def reduce(b: KmvBuf, h: Long): KmvBuf = { b.offer(h, k); b }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      a.absorbKeys(b.keys, k); a
    }
    /** Ascending unsigned-order keys (already sign-flipped). */
    override def finish(b: KmvBuf): Seq[Long] = {
      val out = new Array[Long](b.keys.size)
      val it = b.keys.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      out.toSeq
    }
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** `kmv(k, hash)` → `array<long>` of the set's k smallest hash keys in
    * unsigned order (sign-flipped). Feed it 64-bit hashes
    * (`xxhash64(...)`). */
  def kmv(k: Int, hash: Column): Column =
    udaf(new Agg(k), ExpressionEncoder[Long]()).apply(hash)

  private def frac(u: Long): Double =
    (u.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Distinct-count estimate from a sketch's key array: exact (= size)
    * while under capacity, (k−1)/frac(kth) at capacity. */
  def estimate(keys: IndexedSeq[Long], k: Int): Double =
    if (keys.length < k) keys.length.toDouble
    else (k - 1).toDouble / frac(keys.last)

  /** KMV of the union: merge the two ascending key arrays, distinct, keep
    * the k smallest — exactly the sketch the union stream would build. */
  def unionKeys(a: IndexedSeq[Long], b: IndexedSeq[Long], k: Int): IndexedSeq[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(k, a.length + b.length))
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length) { i += 1; a(i - 1) }
        else if (i >= a.length) { j += 1; b(j - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // shared key: consume both once
      out += take
    }
    out.toIndexedSeq
  }
}
