package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Native cosine similarity: one fused pass over both arrays (dot + both
  * norms simultaneously) inside whole-stage codegen. The composed-builtin
  * version (zip_with + aggregate + transform) walks the arrays through
  * interpreted higher-order lambdas — ~50× slower per pair, which dominated
  * the r1 bench on every pairwise query. Accumulation is left-to-right in
  * double, matching DuckDB's list_cosine_similarity bit-for-bit (the oracle
  * comparison relies on this). */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.sim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.sim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSim {
  /** dot(a,b) / (||a||·||b||), fused single pass (static codegen entry).
    * Dimension mismatch fails loudly (silent truncation surfaced bogus
    * neighbours — ADVICE r2); a zero-norm vector has no direction, so its
    * similarity is defined as 0.0 (NaN would sort ABOVE every real value
    * in a descending top-k rank). */
  def sim(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Random-hyperplane LSH bucket keys: nTables × planesPer plane dots in ONE
  * pass over the vector (the composed zip_with/aggregate version evaluated
  * 192 interpreted lambda dots per row at the oracle configuration). Key
  * layout matches EmbeddingOps.bucketsOf: sign bits little-endian within a
  * table, table id in the high 32 bits. */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"
  override protected def nullSafeEval(v: Any): Any =
    LshBuckets.buckets(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBuckets.buckets($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBuckets {
  def buckets(vec: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getDouble(i); i += 1 }
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = t.toLong << 32
      var p = 0
      while (p < table.length) {
        val plane = table(p)
        var d = 0.0
        var j = 0
        val m = math.min(n, plane.length)
        while (j < m) { d += v(j) * plane(j); j += 1 }
        if (d >= 0) key += (1L << p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  def lshBuckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(LshBuckets(ExpressionUtils.expression(vec), planes))
}

/** Product-quantization encode: the vector is split into M contiguous
  * subspaces and each sub-vector is replaced by the index of its nearest
  * codeword in that subspace's codebook — one native pass, the codebooks
  * ride in the plan as a constant (M × K × dim/M doubles). At 100 TB this
  * is the ANN storage story: 8 one-byte-range codes replace 64 doubles. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  /** Exact-match index per subspace: the lossless oracle codebook holds
    * every distinct sub-vector, so encode is a hash lookup instead of a
    * K-codeword argmin scan (K = thousands in that configuration); any
    * miss — trained codebooks, novel vectors — falls back to the scan, so
    * results never change. The expression instance is deserialized fresh
    * per TASK, so the transient lazy alone would rebuild the index per
    * task; the content-keyed JVM cache in the companion makes it
    * once-per-executor. */
  @transient private lazy val exactIndex
      : Array[java.util.HashMap[java.util.ArrayList[java.lang.Double], Integer]] =
    PqEncode.indexFor(codebooks)

  def encodeFast(vec: ArrayData): ArrayData = {
    val m = codebooks.length
    val n = vec.numElements()
    val out = new Array[Any](m)
    var s = 0
    var off = 0
    while (s < m) {
      val dsub = codebooks(s)(0).length
      val key = new java.util.ArrayList[java.lang.Double](dsub)
      var i = 0
      while (i < dsub && off + i < n) { key.add(vec.getDouble(off + i)); i += 1 }
      val hit = exactIndex(s).get(key)
      // hit-side guard: the JVM cache keys on a 64-bit content fingerprint;
      // on the (2^-64) chance two codebooks collide, a hit could come from
      // the wrong index — verify the codeword matches before trusting it
      out(s) =
        if (hit != null && PqEncode.sameSub(vec, codebooks(s)(hit.intValue()), off, n))
          hit.intValue()
        else PqEncode.argminSub(vec, codebooks(s), off, n)
      off += dsub
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    encodeFast(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression so codegen reuses the executor-cached index
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeFast($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncode {
  private val indexCache = new java.util.concurrent.ConcurrentHashMap[
    java.lang.Long,
    Array[java.util.HashMap[java.util.ArrayList[java.lang.Double], Integer]]]()

  /** 64-bit FNV over the full codebook content — the JVM-wide cache key
    * (deserialized copies of the same codebook hash identically). */
  private def fingerprint(books: Array[Array[Array[Double]]]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(x: Long): Unit = { h ^= x; h *= 0x100000001b3L }
    mix(books.length)
    books.foreach { book =>
      mix(book.length)
      book.foreach { cw =>
        mix(cw.length)
        cw.foreach(d => mix(java.lang.Double.doubleToLongBits(d)))
      }
    }
    h
  }

  private[functions] def indexFor(books: Array[Array[Array[Double]]])
      : Array[java.util.HashMap[java.util.ArrayList[java.lang.Double], Integer]] = {
    if (indexCache.size > 8) indexCache.clear() // bound executor memory
    indexCache.computeIfAbsent(fingerprint(books), _ =>
      books.map { book =>
        val m = new java.util.HashMap[java.util.ArrayList[java.lang.Double], Integer](book.length * 2)
        var c = 0
        while (c < book.length) {
          val key = new java.util.ArrayList[java.lang.Double](book(c).length)
          book(c).foreach(d => key.add(d))
          m.putIfAbsent(key, c) // first match wins, like the argmin scan on d=0
          c += 1
        }
        m
      })
  }

  /** Element-wise equality of a sub-vector against a codeword. */
  def sameSub(vec: ArrayData, cw: Array[Double], off: Int, n: Int): Boolean = {
    var i = 0
    while (i < cw.length) {
      if (off + i >= n || vec.getDouble(off + i) != cw(i)) return false
      i += 1
    }
    true
  }

  /** Argmin over one subspace's codewords (the fallback scan; static,
    * uniquely named — see [[ArgMinCentroid.assign]]'s forwarder note). */
  def argminSub(vec: ArrayData, book: Array[Array[Double]],
                off: Int, n: Int): Int = {
    val dsub = book(0).length
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cent = book(c)
      var d = 0.0
      var i = 0
      while (i < dsub && off + i < n) {
        val diff = vec.getDouble(off + i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), books))
}

/** Product-quantization decode: codes → the concatenation of their
  * codewords (the quantized reconstruction candidates are scored against —
  * reconstruction error IS the quantization error; with a lossless
  * codebook it is zero and decode is bit-exact). */
case class PqDecode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_decode"
  override protected def nullSafeEval(v: Any): Any =
    PqDecode.decode(v.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqDecode.decode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqDecode {
  def decode(codes: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    var dim = 0
    var s = 0
    while (s < m) { dim += books(s)(0).length; s += 1 }
    val out = new Array[Any](dim)
    var off = 0
    s = 0
    while (s < m) {
      val cent = books(s)(codes.getInt(s))
      var i = 0
      while (i < cent.length) { out(off + i) = cent(i); i += 1 }
      off += cent.length
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqDecode(codes: Column, books: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqDecode(ExpressionUtils.expression(codes), books))
}

/** IVF-PQ residual decode: `codes` are PQ codes of (v − centroid(cluster)),
  * so the reconstruction is centroid(cluster) + concat(codewords) — one
  * native pass, both codebooks ride the plan as constants. The composed
  * IVFADC layout (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011) stores exactly this pair per vector. */
case class PqDecodeResidual(left: Expression, right: Expression,
                            codebooks: Array[Array[Array[Double]]],
                            centroids: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_decode_residual"
  override protected def nullSafeEval(codes: Any, cluster: Any): Any =
    PqDecodeResidual.decodePlus(codes.asInstanceOf[ArrayData],
      cluster.asInstanceOf[Int], codebooks, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", codebooks, "double[][][]")
    val c = ctx.addReferenceObj("cents", centroids, "double[][]")
    defineCodeGen(ctx, ev, (codes, cluster) =>
      s"graft.functions.PqDecodeResidual.decodePlus($codes, $cluster, $b, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqDecodeResidual {
  def decodePlus(codes: ArrayData, cluster: Int,
                 books: Array[Array[Array[Double]]],
                 cents: Array[Array[Double]]): ArrayData = {
    val cent = cents(cluster)
    var dim = 0
    var s = 0
    while (s < books.length) { dim += books(s)(0).length; s += 1 }
    // dimension mismatch fails loudly (the CosineSim rule: silent
    // truncation produces numerically-valid but WRONG reconstructions)
    if (dim != cent.length)
      throw new IllegalArgumentException(
        s"pq_decode_residual: codebooks decode $dim dims but centroid has ${cent.length}")
    val out = new Array[Any](cent.length)
    var off = 0
    s = 0
    while (s < books.length) {
      val cw = books(s)(codes.getInt(s))
      var i = 0
      while (i < cw.length) {
        out(off + i) = cent(off + i) + cw(i)
        i += 1
      }
      off += cw.length
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqDecodeResidual(codes: Column, cluster: Column,
                       books: Array[Array[Array[Double]]],
                       cents: Array[Array[Double]]): Column =
    ExpressionUtils.column(PqDecodeResidual(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(cluster),
      books, cents))
}

/** Residual against an ALREADY-ASSIGNED coarse centroid: v − centroid(c).
  * Binary (vec, cluster) like [[PqDecodeResidual]], so the index build
  * computes the argmin ONCE for the `cluster` column and reuses it here —
  * a unary argmin-fused variant would scan the nCells×dim codebook twice
  * per row. Dimension mismatch fails loudly (the CosineSim rule). */
case class CentroidResidual(left: Expression, right: Expression,
                            centroids: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_residual"
  override protected def nullSafeEval(v: Any, c: Any): Any =
    CentroidResidual.residual(v.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", centroids, "double[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.CentroidResidual.residual($v, $c, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CentroidResidual {
  def residual(vec: ArrayData, cluster: Int,
               cents: Array[Array[Double]]): ArrayData = {
    val cent = cents(cluster)
    val n = vec.numElements()
    if (n != cent.length)
      throw new IllegalArgumentException(
        s"centroid_residual: vector has $n dims but centroid has ${cent.length}")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = vec.getDouble(i) - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  def centroidResidual(vec: Column, cluster: Column,
                       cents: Array[Array[Double]]): Column =
    ExpressionUtils.column(CentroidResidual(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(cluster), cents))
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

/** Int8 symmetric per-vector quantization audit: ONE fused pass computes
  * the scale (max|x|/127), quantizes each element with floor(x/scale+0.5)
  * clamped to [-127,127], decodes, and accumulates the max reconstruction
  * error plus the original↔decode cosine — the fidelity triple an embedding
  * store measures before committing to 4× smaller vectors. The arithmetic
  * is chosen for cross-engine determinism: floor(x+0.5) rounding (identical
  * in DuckDB, unlike Math.round's toward-+∞ tie break vs SQL round's
  * away-from-zero), and left-to-right cosine accumulation matching
  * [[CosineSim.sim]] / DuckDB list_cosine_similarity. Output is
  * array(scale, max_err, cos); the all-zero vector degenerates to
  * (0, 0, 0) — same sentinel as CosineSim's zero-norm convention. */
case class Int8QuantAudit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quant_audit"
  override protected def nullSafeEval(v: Any): Any =
    Int8QuantAudit.audit(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8QuantAudit.audit($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Int8QuantAudit {
  /** Static codegen entry (uniquely named — a companion `eval` would mask
    * the expression's inherited eval and kill the static forwarder). */
  def audit(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i)); if (v > mx) mx = v; i += 1
    }
    val scale = mx / 127.0
    var maxErr = 0.0; var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val d = if (scale == 0.0) 0.0 else {
        var q = math.floor(x / scale + 0.5)
        if (q > 127.0) q = 127.0 else if (q < -127.0) q = -127.0
        q * scale
      }
      val e = math.abs(x - d); if (e > maxErr) maxErr = e
      dot += x * d; na += x * x; nb += d * d
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    val cos = if (denom == 0.0) 0.0 else dot / denom
    new GenericArrayData(Array(scale, maxErr, cos))
  }

  def int8QuantAudit(v: Column): Column =
    ExpressionUtils.column(Int8QuantAudit(ExpressionUtils.expression(v)))
}

/** Int8 symmetric encode to a BINARY column: one byte per dimension (the
  * true 4× storage layout vs float32 — parquet stores int arrays as int32,
  * so the byte-array form is what actually shrinks the store). Same
  * deterministic floor(x/scale+0.5) clamp arithmetic as [[Int8QuantAudit]];
  * the per-vector scale travels in a sibling column (needed to DECODE, but
  * not to RANK — symmetric quantization cancels the scale inside cosine,
  * see [[Int8CosSim]]). */
case class Int8Codes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_codes"
  override protected def nullSafeEval(v: Any): Any =
    Int8Codes.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Codes.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Int8Codes {
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i)); if (v > mx) mx = v; i += 1
    }
    val scale = mx / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = if (scale == 0.0) 0.0 else {
        var b = math.floor(a.getDouble(i) / scale + 0.5)
        if (b > 127.0) b = 127.0 else if (b < -127.0) b = -127.0
        b
      }
      out(i) = q.toByte
      i += 1
    }
    out
  }

  def int8Codes(v: Column): Column =
    ExpressionUtils.column(Int8Codes(ExpressionUtils.expression(v)))
}

/** Cosine of a full-precision query against an int8-coded vector WITHOUT
  * decoding: cos(q, scale·c) = cos(q, c) — the symmetric scale divides out
  * of both the dot and the norm, so the compressed scan never touches the
  * scale column and the bytes never widen to a materialized double array.
  * One fused pass, whole-stage codegen. */
case class Int8CosSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_cos_sim"
  override protected def nullSafeEval(codes: Any, q: Any): Any =
    Int8CosSim.sim(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, q) => s"graft.functions.Int8CosSim.sim($c, $q)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Int8CosSim {
  def sim(codes: Array[Byte], q: ArrayData): Double = {
    val n = math.min(codes.length, q.numElements())
    var dot = 0.0; var nc = 0.0; var nq = 0.0
    var i = 0
    while (i < n) {
      val c = codes(i).toDouble
      val x = q.getDouble(i)
      dot += x * c; nc += c * c; nq += x * x
      i += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(nc)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def int8CosSim(codes: Column, q: Column): Column =
    ExpressionUtils.column(Int8CosSim(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(q)))
}
