package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Real multimodal metadata decode for container formats whose structure is
  * pure byte layout — no codec library required: BMP (dimensions from the
  * 54-byte header) and WAV/RIFF (sample rate / channels / bit depth from
  * the fmt chunk). Formats that need an actual codec (JPEG entropy decode,
  * MP4 sample tables) stay behind the documented stub in
  * [[TextOps.multimodalMeta]]; this upgrades the plumbing-only story to a
  * working decode path for the layouts the JVM can parse byte-for-byte.
  *
  * Execution shape is the one a 100 TB media pipeline needs: the payload
  * travels as an opaque binary column, the decode runs partition-batched
  * ([[decodeMeta]] is a `mapPartitions`-style Dataset map — one JVM-local
  * pass, no shuffle, no UDF registry), and malformed payloads degrade to
  * `valid=false` rows instead of failing the task — at a trillion rows
  * there is ALWAYS a corrupt file, and a retry loop that dies on it costs
  * more than a quarantine column. */
object MediaOps {

  final case class MediaMeta(
      doc_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_bytes: Long, valid: Boolean)

  private def le16(b: Array[Byte], off: Int): Int =
    if (off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    if (off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    if (off + len > b.length) ""
    else new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one payload. Total work is O(header), not O(bytes) — the body is
    * never touched, so throughput is bounded by IO, not decode. */
  def sniff(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    def invalid(kind: String) = MediaMeta(id, kind, -1, -1, -1, -1, -1, n, valid = false)
    if (bytes == null || bytes.length < 2) invalid("unknown")
    else if (ascii(bytes, 0, 2) == "BM") {
      // BITMAPINFOHEADER: size@14, width@18, height@22 (LE, height may be
      // negative for top-down rows), bpp@28
      val w = le32(bytes, 18)
      val h = math.abs(le32(bytes, 22))
      val bpp = le16(bytes, 28)
      if (bytes.length >= 54 && w > 0 && h > 0)
        MediaMeta(id, "bmp", w, h, -1, -1, bpp, n, valid = true)
      else invalid("bmp")
    } else if (bytes.length >= 12 &&
        ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE") {
      // walk RIFF chunks to the fmt chunk (it is not always at offset 12).
      // The cursor is a Long: a crafted 4-byte chunk size near Int.MaxValue
      // would wrap Int arithmetic to a negative offset that passes the
      // bounds checks and crashes the read — quarantine, never throw.
      var off: Long = 12L
      var out: MediaMeta = invalid("wav")
      while (off + 8 <= bytes.length && !out.valid) {
        val io = off.toInt // safe: 0 <= off <= length - 8 here
        val cid = ascii(bytes, io, 4)
        val csz = le32(bytes, io + 4).toLong
        if (cid == "fmt " && csz >= 16 && io + 8 + 16 <= bytes.length) {
          val ch = le16(bytes, io + 10)
          val rate = le32(bytes, io + 12)
          val bits = le16(bytes, io + 22)
          if (ch > 0 && rate > 0)
            out = MediaMeta(id, "wav", -1, -1, rate, ch, bits, n, valid = true)
        }
        if (csz < 0) off = bytes.length.toLong // corrupt size → stop
        else off += 8L + csz + (csz & 1L) // RIFF chunks are 2-byte aligned
      }
      out
    } else invalid("unknown")
  }

  /** Partition-batched decode over `(doc_id, payload)` — binary transport
    * in, typed metadata out, one narrow pass. */
  def decodeMeta(bin: Dataset[(Long, Array[Byte])]): DataFrame = {
    import bin.sparkSession.implicits._
    bin.mapPartitions(_.map { case (id, bytes) => sniff(id, bytes) }).toDF()
  }

  // ---- Real pixel ops on uncompressed BMP (raw BGR byte math) ------------

  private def bmpGeometry(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 54 || ascii(bytes, 0, 2) != "BM") return None
    val w = le32(bytes, 18)
    val h = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val off = le32(bytes, 10)
    // all geometry math in Long: a crafted width near Int.MaxValue would
    // wrap `bpp*w` to a tiny rowSize that passes the size check and sends
    // the pixel loops out of bounds
    val rowSizeL = ((bpp.toLong * w + 31) / 32) * 4
    if (w <= 0 || h == 0 || h == Int.MinValue || bpp != 24 || off < 54 ||
      rowSizeL > Int.MaxValue ||
      off.toLong + rowSizeL * math.abs(h.toLong) > bytes.length) None
    else Some((w, h, off, rowSizeL.toInt))
  }

  /** Nearest-neighbour resize of a 24-bpp BMP — an ACTUAL image transform
    * in pure byte math (BMP pixel arrays are raw BGR rows, 4-byte-aligned):
    * the `resize` stage of a media pipeline without any codec dependency.
    * Returns None for payloads that are not uncompressed 24-bpp BMPs (those
    * formats need a real codec — quarantine, don't guess). Row orientation
    * (bottom-up vs top-down) is preserved via the height sign. */
  def resizeBmp(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    bmpGeometry(bytes).map { case (w, h, off, rowSize) =>
      val ah = math.abs(h)
      val outRow = ((24 * outW + 31) / 32) * 4
      val out = new Array[Byte](54 + outRow * outH)
      // header: copy the source's, patch size/dims/offset
      System.arraycopy(bytes, 0, out, 0, 54)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(2, out.length)
      bb.putInt(10, 54)
      bb.putInt(18, outW)
      bb.putInt(22, if (h < 0) -outH else outH)
      bb.putInt(34, outRow * outH) // biSizeImage
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * ah / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * w / outW).toInt
          val src = off + sy * rowSize + sx * 3
          val dst = 54 + y * outRow + x * 3
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }

  /** Per-channel mean over a 24-bpp BMP's pixels — the feature-extract
    * stage (mean colour is the canonical cheap image feature), again pure
    * byte math. Returns (meanB, meanG, meanR). */
  def bmpChannelMeans(bytes: Array[Byte]): Option[(Double, Double, Double)] =
    bmpGeometry(bytes).map { case (w, h, off, rowSize) =>
      val ah = math.abs(h)
      var sb = 0L; var sg = 0L; var sr = 0L
      var y = 0
      while (y < ah) {
        var x = 0
        val base = off + y * rowSize
        while (x < w) {
          sb += bytes(base + x * 3) & 0xFF
          sg += bytes(base + x * 3 + 1) & 0xFF
          sr += bytes(base + x * 3 + 2) & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * ah
      (sb / n, sg / n, sr / n)
    }

  /** Distributed thumbnailing: binary in → resized binary + geometry out,
    * one narrow partition-batched pass; non-BMP payloads pass through as
    * null thumbnails with valid=false (quarantine column, task never
    * fails). */
  def thumbnails(bin: Dataset[(Long, Array[Byte])], outW: Int, outH: Int): DataFrame = {
    import bin.sparkSession.implicits._
    bin.mapPartitions(_.map { case (id, bytes) =>
      resizeBmp(bytes, outW, outH) match {
        case Some(t) => (id, t, outW, outH, true)
        case None => (id, null.asInstanceOf[Array[Byte]], -1, -1, false)
      }
    }).toDF("doc_id", "thumb", "width", "height", "valid")
  }
}
