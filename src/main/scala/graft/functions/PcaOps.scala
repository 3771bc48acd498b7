package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}

/** `quant_dot_fp(vec, w, scale)`: Σ_i floor(vec_i·scale)·w_i as int64 — the
  * per-row projection onto a fixed-point component, one fused native pass
  * (quantize + dot) inside whole-stage codegen. Top-level class: the
  * generated code calls the companion's static forwarder (a nested object
  * has none — Janino would fail and Spark would silently interpret). */
case class QuantDotFp(child: Expression, weights: Array[Long], scale: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_dot_fp"
  override protected def nullSafeEval(v: Any): Any =
    QuantDotFp.project(v.asInstanceOf[ArrayData], weights, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantDotFp.project($c, $ref, ${scale}L)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QuantDotFp {
  /** Static codegen entry (unique name — the forwarder trap). */
  def project(a: ArrayData, w: Array[Long], scale: Long): Long = {
    val n = a.numElements()
    if (n != w.length)
      throw new IllegalArgumentException(
        s"quant_dot_fp: dimension mismatch ($n vs ${w.length})")
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(a.getDouble(i) * scale).toLong * w(i)
      i += 1
    }
    s
  }
}

/** Fixed-point PCA plumbing (see [[graft.operators.EmbeddingOps
  * .pcaProjectQuery]] for the full design note). Everything here is integer
  * arithmetic over the quantized vectors q_i = floor(x_i · scale), so the
  * distributed aggregation is exactly associative and the DuckDB oracle
  * reproduces every value bit-for-bit — a float Gram matrix would drift by
  * Spark's partition-merge order and flip the hash gate.
  */
object PcaOps {

  /** Upper-triangle Gram accumulator: ONE pass over the embedding table,
    * d(d+1)/2 int64 sums as the aggregation state (d=64 → 2080 longs ≈
    * 16 KB — constant-size, map-side combined, merged once per partition;
    * the classic "covariance in one shuffle of O(d²), never O(n)" shape).
    * Overflow bound: |x| ≤ 1 ⇒ |q| ≤ scale ⇒ each row adds ≤ scale² per
    * cell, so int64 holds ~9·10¹² rows at scale=1000; a 10¹³-row corpus
    * would drop scale to 100 or split each cell into two longs. */
  final class GramAgg(dim: Int, scale: Long)
      extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](dim * (dim + 1) / 2)
    override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
      if (v == null) return buf // null vector: no direction, no contribution
      require(v.length == dim, s"gram_agg: expected dim $dim, got ${v.length}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = math.floor(v(i) * scale).toLong; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { buf(k) += q(i) * q(j); j += 1; k += 1 }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** `gram(dim, scale, vec)` → the d(d+1)/2 upper-triangle sums
    * Σ_rows q_i·q_j (row-major, i ≤ j). Typed Aggregator via `udaf` — stays
    * inside ObjectHashAggregate, no ScalaUDF in the plan. */
  def gram(dim: Int, scale: Long, vec: Column): Column =
    udaf(new GramAgg(dim, scale), ExpressionEncoder[Seq[Double]]()).apply(vec)

  /** Dominant eigenvector by integer power iteration with ∞-norm rescaling
    * (driver-side: the Gram matrix is d², never data-sized). v₀ = unit·1e6;
    * v_{t+1} = (G·v_t)·1e6 div max|G·v_t|, BigInt intermediates, division
    * truncating toward zero — the exact arithmetic the oracle's unrolled
    * CTE chain performs in HUGEINT, so the two agree bit-for-bit. ∞-norm
    * rescaling (instead of L2) keeps everything integral: no sqrt, no
    * float, still converges to the dominant eigendirection (the scaling
    * choice only changes the vector's length, which the projection shares).
    */
  def powerIterate(upper: Seq[Long], dim: Int, iters: Int): Array[Long] = {
    require(upper.length == dim * (dim + 1) / 2,
      s"power_iterate: ${upper.length} cells for dim $dim")
    val g = Array.ofDim[Long](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) { g(i)(j) = upper(k); g(j)(i) = upper(k); j += 1; k += 1 }
      i += 1
    }
    var v = Array.fill(dim)(BigInt(1000000L))
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(dim) { a =>
        var s = BigInt(0)
        var b = 0
        while (b < dim) { s += BigInt(g(a)(b)) * v(b); b += 1 }
        s
      }
      val m = w.map(_.abs).max
      // all-zero Gram (all-zero vectors): direction undefined, keep v
      if (m > 0) v = w.map(x => x * 1000000L / m) // BigInt / truncates to zero
      t += 1
    }
    v.map(_.toLong)
  }

  def quantDotFp(vec: Column, weights: Array[Long], scale: Long): Column =
    ExpressionUtils.column(
      QuantDotFp(ExpressionUtils.expression(vec), weights, scale))
}
