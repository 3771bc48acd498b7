package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter
import org.apache.spark.unsafe.types.UTF8String

/** `bloom_might_contain_any(id)` — true iff ANY of the serialized bloom
  * filters might contain the id. The merge sink's per-microbatch dedup
  * prefilter ran as an interpreted per-row Scala UDF (closure-serialized
  * every batch, opaque to codegen — VERDICT r2 wrong-4); this is the
  * [[Signatures]]-pattern native replacement: the filters ride the plan as
  * serialized bytes, are deserialized once per task, and the probe runs on
  * the raw UTF-8 bytes inside whole-stage codegen (Spark's
  * `mightContainString` is itself `mightContainBinary` over the UTF-8
  * encoding, so probing `UTF8String.getBytes` avoids the per-row String
  * allocation the UDF paid).
  *
  * OR-across-filters rather than a merged filter because per-batch blooms
  * are sized from different row counts and `mergeInPlace` throws
  * `IncompatibleMergeException` across sizes (LakeSink r2 note). */
case class BloomMightContainAny(child: Expression, filters: Array[Array[Byte]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_any"

  @transient private lazy val bfs: Array[BloomFilter] =
    filters.map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  def might(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < bfs.length) {
      if (bfs(i).mightContainBinary(bytes)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(v: Any): Any =
    might(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS instance so generated code reuses the lazily
    // deserialized per-task filters
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainAny].getName)
    defineCodeGen(ctx, ev, c => s"$ref.might($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bloom_any_element(arr)` — true iff ANY element of the string array
  * might be in the (single) bloom filter. The array-side twin of
  * [[BloomMightContainAny]]: the in-stream decontamination gate probes
  * every shingle of a row against an eval-set bloom — as a native loop, not
  * an interpreted `exists()` higher-order lambda (the [[Signatures]]
  * per-element-interpretation trap). Short-circuits on the first hit. */
case class BloomAnyElement(child: Expression, filter: Array[Byte])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_any_element"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filter))

  def anyMight(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          bf.mightContainBinary(arr.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(v: Any): Any =
    anyMight(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAny", this, classOf[BloomAnyElement].getName)
    defineCodeGen(ctx, ev, c => s"$ref.anyMight($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomProbe {
  def mightContainAny(id: Column, filters: Array[Array[Byte]]): Column =
    ExpressionUtils.column(
      BloomMightContainAny(ExpressionUtils.expression(id), filters))

  def anyElement(arr: Column, filter: Array[Byte]): Column =
    ExpressionUtils.column(
      BloomAnyElement(ExpressionUtils.expression(arr), filter))

  /** Build + serialize a bloom over a string set (driver-side; the eval
    * set is benchmark-sized). */
  def build(items: Seq[String], fpp: Double = 0.001): Array[Byte] = {
    val bf = BloomFilter.create(math.max(items.length.toLong, 1L), fpp)
    items.foreach(bf.putString)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
