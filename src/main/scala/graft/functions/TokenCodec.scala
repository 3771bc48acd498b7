package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-array ⇄ string codec for the pre-tokenized input table
  * (BASELINE.json input_hint: `tokens array<int>` carries the event payload).
  *
  * Tokens are Unicode code points of the event's JSON text, so "token-array
  * equality" per row is exactly byte equality of the carried event. Both
  * directions are native Catalyst expressions with codegen (hot path of the
  * 10^12-row decode stage — a Scala UDF here would add ser/de per row).
  */
object TokenCodec {
  /** Static decode used by generated code: array<int> code points → string.
    * Writes UTF-8 bytes directly (no intermediate String/char[] — this is
    * the per-row hot path of the 10^12-row decode stage, and the two large
    * intermediate allocations measurably cost memory bandwidth at high
    * parallelism). */
  def decode(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      val cp = tokens.getInt(i)
      len += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      i += 1
    }
    val b = new Array[Byte](len)
    var p = 0
    i = 0
    while (i < n) {
      val cp = tokens.getInt(i)
      if (cp < 0x80) { b(p) = cp.toByte; p += 1 }
      else if (cp < 0x800) {
        b(p) = (0xc0 | (cp >> 6)).toByte
        b(p + 1) = (0x80 | (cp & 0x3f)).toByte
        p += 2
      } else if (cp < 0x10000) {
        b(p) = (0xe0 | (cp >> 12)).toByte
        b(p + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        b(p + 2) = (0x80 | (cp & 0x3f)).toByte
        p += 3
      } else {
        b(p) = (0xf0 | (cp >> 18)).toByte
        b(p + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
        b(p + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        b(p + 3) = (0x80 | (cp & 0x3f)).toByte
        p += 4
      }
      i += 1
    }
    UTF8String.fromBytes(b)
  }

  /** Static encode used by generated code: string → array<int> code points. */
  def encode(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out.add(cp)
      i += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray)
  }

  def encodeString(s: String): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      buf += cp
      i += Character.charCount(cp)
    }
    buf.toArray
  }

  def decodeString(tokens: Seq[Int]): String = {
    val sb = new java.lang.StringBuilder(tokens.length)
    tokens.foreach(sb.appendCodePoint)
    sb.toString
  }

  def decodeTokens(tokens: Column): Column =
    ExpressionUtils.column(CodepointsToString(ExpressionUtils.expression(tokens)))

  def encodeTokens(text: Column): Column =
    ExpressionUtils.column(StringToCodepoints(ExpressionUtils.expression(text)))
}

case class CodepointsToString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "codepoints_to_string"
  override protected def nullSafeEval(v: Any): Any =
    TokenCodec.decode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCodec.decode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class StringToCodepoints(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_to_codepoints"
  override protected def nullSafeEval(v: Any): Any =
    TokenCodec.encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCodec.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
