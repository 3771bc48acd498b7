package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** xAPI statement equivalence (conflict detection, D6).
  *
  * Reference: `statements_are_equivalent`
  * (/root/reference/src/ralph/utils.py:167-186) — statements must be equal
  * on {actor, verb, object, id, result, context, attachments} always, and on
  * {timestamp, version} only when the field is present in BOTH; `authority`
  * and `stored` are ignored. Equality is python dict equality → here deep
  * JsonNode equality (key-order-insensitive), which plain struct `===`
  * cannot express (null-aware "present in both" + open-keyed maps), hence a
  * native expression.
  */
object XapiEquivalent {
  private val mapper = new ObjectMapper()
  private val always = Seq("actor", "verb", "object", "id", "result", "context", "attachments")
  private val whenBoth = Seq("timestamp", "version")

  def equivalent(a: String, b: String): Boolean = {
    val x = mapper.readTree(a)
    val y = mapper.readTree(b)
    val fields = always ++ whenBoth.filter(f => x.has(f) && y.has(f))
    fields.forall { f =>
      val xv = x.get(f); val yv = y.get(f)
      if (xv == null || yv == null) xv == yv else xv.equals(yv)
    }
  }

  def evalUtf8(a: UTF8String, b: UTF8String): Boolean = equivalent(a.toString, b.toString)

  def xapiEquivalent(a: Column, b: Column): Column =
    ExpressionUtils.column(XapiEquivalentExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

case class XapiEquivalentExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xapi_equivalent"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    XapiEquivalent.evalUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.XapiEquivalent.evalUtf8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
