package graft.functions

import java.security.MessageDigest
import java.util.UUID

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 version-5 (SHA-1, name-based) UUID.
  *
  * The reference derives deterministic statement ids from the raw event
  * string: `id = uuid5(uuid_namespace, event_str)`
  * (/root/reference/src/ralph/models/edx/converters/xapi/base.py:34-39).
  * That determinism is what makes the whole convert pipeline idempotent and
  * replayable, so it is implemented as a native Catalyst expression (codegen
  * via a static call — stays inside whole-stage codegen) rather than a UDF.
  */
object Uuid5 {
  // MessageDigest.getInstance does a provider lookup per call — measurable
  // at 10^12 rows; reuse one digest per thread.
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }
  // the namespace is almost always a literal column — cache the last parse
  private val nsCache = new ThreadLocal[(String, UUID)]

  /** Pure implementation, byte-compatible with Python's `uuid.uuid5`. */
  def uuid5(namespace: UUID, name: Array[Byte]): UUID = {
    val md = digest.get()
    md.reset()
    val nsBytes = new Array[Byte](16)
    var i = 0
    val msb = namespace.getMostSignificantBits
    val lsb = namespace.getLeastSignificantBits
    while (i < 8) { nsBytes(i) = ((msb >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
    while (i < 16) { nsBytes(i) = ((lsb >>> (8 * (15 - i))) & 0xff).toByte; i += 1 }
    md.update(nsBytes)
    md.update(name)
    val h = md.digest() // 20 bytes; take first 16
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 8) { hi = (hi << 8) | (h(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (h(i) & 0xffL); i += 1 }
    new UUID(hi, lo)
  }

  def uuid5(namespace: String, name: String): String =
    uuid5(UUID.fromString(namespace), name.getBytes("UTF-8")).toString

  /** Static entry point used by generated code. */
  def evalUtf8(ns: UTF8String, name: UTF8String): UTF8String = {
    val nsStr = ns.toString
    val cached = nsCache.get()
    val nsUuid =
      if (cached != null && cached._1 == nsStr) cached._2
      else { val u = UUID.fromString(nsStr); nsCache.set((nsStr, u)); u }
    UTF8String.fromString(uuid5(nsUuid, name.getBytes).toString)
  }

  /** Column API: uuid5(namespace, name) → canonical lowercase UUID string. */
  def uuid5Col(namespace: Column, name: Column): Column =
    ExpressionUtils.column(
      Uuid5Expr(ExpressionUtils.expression(namespace), ExpressionUtils.expression(name)))
}

case class Uuid5Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "uuid5"

  override protected def nullSafeEval(ns: Any, name: Any): Any =
    Uuid5.evalUtf8(ns.asInstanceOf[UTF8String], name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ns, name) => s"graft.functions.Uuid5.evalUtf8($ns, $name)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
