package graft.functions

import java.util.regex.Pattern

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-row xAPI validation verdict: `xapi_row_validate(raw)` →
  * struct<status, model> from ONE Jackson parse — template selection on
  * (verb.id, object.definition.type), IFI exclusivity/formats, score
  * ordering, version pattern, platform/revision-needs-Activity, timestamp
  * parse, and the strict raw-JSON rules ([[XapiStrict]]). Single-child,
  * single-call for the same reason as [[EdxRowValidate]]: predicate
  * pushdown may only duplicate one parse. */
object XapiModels {

  private val mapper = new ObjectMapper()
  private val MboxRe = Pattern.compile("^mailto:[^@ ]+@[^@ ]+$")
  private val Sha1Re = Pattern.compile("^[0-9a-f]{40}$")
  private val VersionRe = Pattern.compile("^1\\.0\\.[0-9]+$")

  private def g(n: JsonNode, f: String): JsonNode = {
    if (n == null) return null
    val v = n.get(f)
    if (v == null || v.isNull) null else v
  }
  private def text(n: JsonNode, f: String): String = {
    val v = g(n, f)
    if (v != null && v.isTextual) v.asText else null
  }
  private def nonEmpty(s: String): Boolean = s != null && s.nonEmpty

  /** Exactly-one-IFI + per-IFI format constraints (ifi.py:12-61). */
  private def agentOk(a: JsonNode): Boolean = {
    if (a == null || !a.isObject) return false
    val mbox = text(a, "mbox")
    val sha = text(a, "mbox_sha1sum")
    val openid = text(a, "openid")
    val account = g(a, "account")
    val nIfi = Seq(nonEmpty(mbox), nonEmpty(sha), nonEmpty(openid), account != null)
      .count(identity)
    nIfi == 1 &&
      (mbox == null || MboxRe.matcher(mbox).matches()) &&
      (sha == null || Sha1Re.matcher(sha).matches()) &&
      (account == null ||
        (nonEmpty(text(account, "homePage")) && nonEmpty(text(account, "name"))))
  }

  /** Score ordering min ≤ raw ≤ max, scaled ∈ [-1, 1] (results.py:31-42). */
  private def resultOk(r: JsonNode): Boolean = {
    if (r == null) return true
    val s = g(r, "score")
    if (s == null) return true
    val scaled = g(s, "scaled"); val raw = g(s, "raw")
    val min = g(s, "min"); val max = g(s, "max")
    (scaled == null || (scaled.isNumber &&
      scaled.asDouble >= -1.0 && scaled.asDouble <= 1.0)) &&
    (raw == null || min == null || (raw.isNumber && min.isNumber &&
      raw.asDouble >= min.asDouble)) &&
    (raw == null || max == null || (raw.isNumber && max.isNumber &&
      raw.asDouble <= max.asDouble))
  }

  /** (status, model) — status protocol shared with the edX validator. */
  def verdict(raw: String): (String, String) = {
    if (raw == null) return (EdxModels.StatusInvalidJson, null)
    val root =
      try mapper.readTree(raw)
      catch { case _: Exception => return (EdxModels.StatusInvalidJson, null) }
    if (root == null || !root.isObject || g(root, "actor") == null)
      return (EdxModels.StatusInvalidJson, null)

    val verb = text(g(root, "verb"), "id")
    val obj = g(root, "object")
    val objType = text(g(obj, "definition"), "type")
    val model =
      if (verb == null || objType == null) null
      else graft.operators.XapiValidate.Templates.getOrElse((verb, objType), null)
    if (model == null) return (EdxModels.StatusUnknown, null)

    val version = text(root, "version")
    val timestamp = text(root, "timestamp")
    val ctx = g(root, "context")
    val objectTypeProp = text(obj, "objectType")
    val baseOk =
      XapiStrict.okNode(root) &&
      nonEmpty(verb) && nonEmpty(text(obj, "id")) &&
      agentOk(g(root, "actor")) &&
      resultOk(g(root, "result")) &&
      (version == null || VersionRe.matcher(version).matches()) &&
      (timestamp == null || EdxModels.parseTsMicros(timestamp) != EdxModels.NoTs) &&
      // platform/revision only for Activity objects (base/statements.py:62-73)
      ((g(ctx, "platform") == null && g(ctx, "revision") == null) ||
        objectTypeProp == null || objectTypeProp == "Activity") &&
      // per-template context/result payload rules (XapiTemplates registry)
      XapiTemplates.ok(model, root)
    if (baseOk) (EdxModels.StatusOk, model)
    else (EdxModels.StatusInvalidModel, model)
  }

  /** Static entry point for generated code. */
  def verdictRow(raw: UTF8String): InternalRow = {
    val (status, model) =
      if (raw == null) (EdxModels.StatusInvalidJson, null) else verdict(raw.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(status),
      if (model == null) null else UTF8String.fromString(model)))
  }
}

case class XapiRowValidate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = XapiRowValidate.schema
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = false
  override def prettyName: String = "xapi_row_validate"

  override def eval(input: InternalRow): Any =
    XapiModels.verdictRow(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.XapiModels.verdictRow(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object XapiRowValidate {
  val schema: StructType = StructType(Seq(
    StructField("status", StringType, nullable = false),
    StructField("model", StringType, nullable = true)))

  def apply(raw: Column): Column =
    ExpressionUtils.column(XapiRowValidate(ExpressionUtils.expression(raw)))
}
