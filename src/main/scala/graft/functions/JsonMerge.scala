package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shallow JSON object merge: fields of `right` overwrite/append onto
  * `left`, preserving `left`'s key order and any fields unknown to our
  * schemas. This is the lax-passthrough enrichment primitive: the reference
  * enriches statements as python dicts (`extra="allow"`,
  * /root/reference/src/ralph/api/models.py:26-64 and
  * statements.py:564-579), so unknown fields survive; re-serialising
  * through a fixed StructType would drop them, hence a native expression.
  */
object JsonMerge {
  private val mapper = new ObjectMapper()

  def merge(left: String, right: String): String = {
    val a = mapper.readTree(left)
    val b = mapper.readTree(right)
    (a, b) match {
      case (ao: ObjectNode, bo: ObjectNode) => ao.setAll(bo); mapper.writeValueAsString(ao)
      case _ => left
    }
  }

  def evalUtf8(l: UTF8String, r: UTF8String): UTF8String =
    UTF8String.fromString(merge(l.toString, r.toString))

  def jsonMerge(left: Column, right: Column): Column =
    ExpressionUtils.column(JsonMergeExpr(
      ExpressionUtils.expression(left), ExpressionUtils.expression(right)))
}

case class JsonMergeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_merge"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JsonMerge.evalUtf8(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.JsonMerge.evalUtf8($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
