package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the near-dup dedup family.
  *
  * The composed-builtin versions (64 × `transform`/`aggregate` higher-order
  * passes per row) are interpreted per element; at 10^12 documents that
  * dominates the plan. These expressions make one pass over the token array
  * per row inside whole-stage codegen (static call), computing all hash
  * slots simultaneously. Signature hash choice is internal — candidate
  * pairs are always re-verified with exact Jaccard, so output semantics are
  * unchanged (precision 1.0, recall set by the band shape).
  */
object Signatures {

  val NumHashes = 64
  private val P31 = 2147483647L // 2^31 - 1

  // per-slot universal-hash coefficients from the deterministic stream
  private val As: Array[Long] =
    Array.tabulate(NumHashes)(i => (graft.sources.Synth.mix(i.toLong, 101L) & P31) | 1L)
  private val Bs: Array[Long] =
    Array.tabulate(NumHashes)(i => graft.sources.Synth.mix(i.toLong, 103L) & P31)

  /** FNV-1a 64-bit over UTF-8 bytes — cheap, stable, allocation-free. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** One-pass MinHash signature: array<long> of NumHashes minima. */
  def minhash(arr: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h31 = fnv64(arr.getUTF8String(i)) & P31
      var j = 0
      while (j < NumHashes) {
        val v = (As(j) * h31 + Bs(j)) % P31
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** One-pass 64-bit SimHash over the (already distinct) token array. */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = fnv64(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 63-bit SimHash over md5-derived feature hashes, one pass.
    *
    * The feature hash is the first 8 bytes of md5(feature), big-endian —
    * a function DuckDB evaluates identically (`('0x' || substr(md5(s),1,16))
    * ::UBIGINT`), so the whole signature is independently recomputable by
    * the SQL oracle; bits 0..62 keep the signature inside a signed int64 on
    * both engines. Use [[simhash]] (FNV) when oracle recomputability is not
    * needed — it is ~3× cheaper per feature. */
  def simhashMd5(arr: ArrayData): Long = {
    val md = md5Digest.get()
    val counts = new Array[Int](63)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 63) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 63) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Distinct k-word shingles in one pass (first-occurrence order) —
    * replaces the interpreted transform/sequence/slice/concat_ws pipeline
    * (5 lambda evaluations per shingle per row). Split semantics mirror
    * `split(text, " ")` with limit -1 (empty tokens kept). */
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val all = buildWindows(s, k)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < all.length) { seen.add(all(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  /** Every k-word rolling window, in order, duplicates kept. Split
    * semantics mirror `split(text, " ")` with limit -1 (empty tokens
    * kept) — the single definition both shingle variants share. */
  private def buildWindows(s: UTF8String, k: Int): Array[String] = {
    val words = s.toString.split(" ", -1)
    if (words.length < k) return Array.empty[String]
    val out = new Array[String](words.length - k + 1)
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** ALL k-word shingles, duplicates kept in order — the counting variant
    * (LM statistics need every occurrence; [[shingles]] dedups for set
    * semantics). */
  def shinglesAll(s: UTF8String, k: Int): ArrayData = {
    val all = buildWindows(s, k)
    val out = new Array[Any](all.length)
    var i = 0
    while (i < all.length) { out(i) = UTF8String.fromString(all(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** One-pass `array(n_valid, n_distinct, top_count)` over an int token
    * array — the per-row repetition statistics a streaming quality gate
    * needs without the O(n²) interpreted higher-order-function shape.
    * NULL slots are excluded from ALL THREE numbers: getInt on a null
    * element reads 0 (fabricating token id 0), and counting nulls in the
    * denominator alone would fabricate phantom duplicates instead. */
  def tokenStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[Int, Int](Math.max(16, n * 2))
    var top = 0
    var valid = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getInt(i)
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > top) top = c
        valid += 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any](valid, counts.size.toLong, top.toLong))
  }

  def minhashSig(shingles: Column): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(shingles)))

  def simhashMd5Sig(features: Column): Column =
    ExpressionUtils.column(SimHashMd5Expr(ExpressionUtils.expression(features)))

  def shinglesCol(text: Column, k: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(text), k))

  def shinglesAllCol(text: Column, k: Int): Column =
    ExpressionUtils.column(ShinglesAllExpr(ExpressionUtils.expression(text), k))

  /** `array(n_valid, n_distinct, top_count)` of an `array<int>` token
    * column (null slots excluded from all three). */
  def tokenStatsCol(tokens: Column): Column =
    ExpressionUtils.column(TokenStatsExpr(ExpressionUtils.expression(tokens)))

  def simhash64(words: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(words)))

  /** Signed feature-hash ("hashing trick") embedding of a token array into
    * `dim` integer counts, one md5 per token, one pass. The bucket is the
    * first 4 md5 bytes big-endian mod `dim` and the sign is the parity of
    * the 9th hex digit (high nibble of byte 4) — both recomputable by the
    * SQL oracle as `('0x'||substr(md5(w),1,8))::UINTEGER % dim` and
    * `('0x'||substr(md5(w),9,1))::UINTEGER % 2`, so the embedding is
    * engine-exact integer data, not float soup. */
  def hashEmbed(arr: ArrayData, dim: Int): ArrayData = {
    val md = md5Digest.get()
    val counts = new Array[Long](dim)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var b = 0
      while (b < 4) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      val idx = (h % dim).toInt
      val sgn = if (((d(4) >> 4) & 1) == 0) 1L else -1L
      counts(idx) += sgn
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Sparse L2-normalized view of an integer count vector: one
    * `(dim, v)` struct per NONZERO count, v = round(count / norm, 6) with
    * norm = sqrt of the exact integer sum of squares. Selecting on the
    * integer count (not the rounded double) matters: a nonzero count whose
    * normalized value rounds to 0.000000 must still produce a row, exactly
    * like the oracle's `HAVING sum(sgn) <> 0`. Zero vector → empty array. */
  def l2NormSparse(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var ss = 0L
    var nz = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      ss += v * v
      if (v != 0L) nz += 1
      i += 1
    }
    if (ss == 0L) return new GenericArrayData(Array.empty[Any])
    val nrm = math.sqrt(ss.toDouble)
    val out = new Array[Any](nz)
    var k = 0
    i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (v != 0L) {
        val nv = BigDecimal(v.toDouble / nrm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, nv))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine of two integer count vectors: exact long dot / (sqrt(ssa) *
    * sqrt(ssb)) — every intermediate is either an exact integer or a single
    * correctly-rounded IEEE op, so the value is reproducible bit-for-bit by
    * any engine that evaluates the same formula. 0.0 when either norm is 0
    * (the [[CosineSim]] convention). */
  def intCosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var ssa = 0L
    var ssb = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      dot += x * y; ssa += x * x; ssb += y * y
      i += 1
    }
    if (ssa == 0L || ssb == 0L) 0.0
    else dot.toDouble / (math.sqrt(ssa.toDouble) * math.sqrt(ssb.toDouble))
  }

  def hashEmbedCol(tokens: Column, dim: Int): Column =
    ExpressionUtils.column(HashEmbedExpr(ExpressionUtils.expression(tokens), dim))

  def l2NormSparseCol(counts: Column): Column =
    ExpressionUtils.column(L2NormSparseExpr(ExpressionUtils.expression(counts)))

  def intCosineCol(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntCosineExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.minhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.minhash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.shingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.shingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShinglesAllExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles_all"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.shinglesAll(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.shinglesAll($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_stats"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.tokenStats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.tokenStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.simhashMd5(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.simhashMd5($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.simhash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HashEmbedExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.hashEmbed(v.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.hashEmbed($c, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class L2NormSparseExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dim", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm_sparse"
  override protected def nullSafeEval(v: Any): Any =
    Signatures.l2NormSparse(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.l2NormSparse($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class IntCosineExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Signatures.intCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Signatures.intCosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
