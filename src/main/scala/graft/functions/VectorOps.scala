package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment for IVF indexing: one native pass over the
  * vector per row against a small constant codebook (k × dim doubles carried
  * in the expression — broadcast with the plan, not joined). */
case class ArgMinCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "argmin_centroid"

  override protected def nullSafeEval(v: Any): Any =
    ArgMinCentroid.assign(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ArgMinCentroid.assign($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ArgMinCentroid {
  /** Squared-L2 argmin. Named `assign` (not `eval`): the companion CLASS
    * inherits `eval(InternalRow)`, which suppresses the static forwarder a
    * same-named object method would need — generated code then fails to
    * compile (the silent r1 codegen fallback in the bench log). */
  def assign(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val n = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < n && i < cent.length) {
        val diff = vec.getDouble(i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def argminCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(ArgMinCentroid(ExpressionUtils.expression(vec), centroids))

  /** All centroid indices ordered by distance (for multi-probe queries). */
  def ranked(vec: Array[Double], centroids: Array[Array[Double]]): Array[Int] =
    centroids.indices.sortBy { c =>
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < vec.length && i < cent.length) {
        val diff = vec(i) - cent(i); d += diff * diff; i += 1
      }
      d
    }.toArray
}
