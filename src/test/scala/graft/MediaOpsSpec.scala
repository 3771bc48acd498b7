package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.MediaOps

/** Real (codec-free) multimodal decode: BMP + WAV headers synthesized
  * byte-for-byte per the public format specs, decoded distributed, with
  * corrupt payloads quarantined instead of failing the task. */
class MediaOpsSpec extends SparkSuite {
  import spark.implicits._

  private def bmp(w: Int, h: Int, bpp: Int = 24): Array[Byte] = {
    val rowSize = ((bpp * w + 31) / 32) * 4
    val dataSize = rowSize * math.abs(h)
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel-array offset
    buf.putInt(40)            // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)
    buf.putShort(1)           // planes
    buf.putShort(bpp.toShort)
    buf.array()
  }

  private def wav(rate: Int, channels: Int, bits: Int, nSamples: Int,
                  junkChunkFirst: Boolean = false): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val out = new ByteArrayOutputStream()
    def le32(v: Int) = out.write(ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def le16(v: Int) = out.write(ByteBuffer.allocate(2)
      .order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())
    out.write("RIFF".getBytes); le32(36 + dataSize); out.write("WAVE".getBytes)
    if (junkChunkFirst) { // fmt is not always the first chunk — spec allows any order
      out.write("JUNK".getBytes); le32(6); out.write(Array.fill(6)(0.toByte))
    }
    out.write("fmt ".getBytes); le32(16)
    le16(1); le16(channels); le32(rate)
    le32(rate * blockAlign); le16(blockAlign); le16(bits)
    out.write("data".getBytes); le32(dataSize)
    out.write(Array.fill(dataSize)(0.toByte))
    out.toByteArray
  }

  test("BMP and WAV headers decode to exact real metadata, distributed") {
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> bmp(640, 480),
      2L -> bmp(16, 9, bpp = 32),
      3L -> wav(44100, 2, 16, 1000),
      4L -> wav(8000, 1, 8, 10, junkChunkFirst = true),
      5L -> "not a media file at all".getBytes,
      6L -> Array[Byte](0x42, 0x4D, 1, 2) // "BM" but truncated
    )
    val out = MediaOps.decodeMeta(rows.toDS().repartition(3))
      .as[MediaOps.MediaMeta].collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).kind === "bmp" && out(1L).width === 640 &&
      out(1L).height === 480 && out(1L).bits_per_sample === 24 && out(1L).valid)
    assert(out(2L).width === 16 && out(2L).height === 9 &&
      out(2L).bits_per_sample === 32)
    assert(out(3L).kind === "wav" && out(3L).sample_rate === 44100 &&
      out(3L).channels === 2 && out(3L).bits_per_sample === 16 && out(3L).valid)
    assert(out(4L).sample_rate === 8000 && out(4L).channels === 1 &&
      out(4L).valid, "fmt chunk found behind a leading JUNK chunk")
    assert(!out(5L).valid && out(5L).kind === "unknown")
    assert(!out(6L).valid && out(6L).kind === "bmp") // sniffed but corrupt
    // corrupt rows are quarantined, never thrown
    assert(out.size === 6)
  }

  private def bmpWithPixels(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val base = bmp(w, h)
    val rowSize = ((24 * w + 31) / 32) * 4
    for (y <- 0 until h; x <- 0 until w) {
      val (b, g, r) = px(x, y)
      val off = 54 + y * rowSize + x * 3
      base(off) = b.toByte; base(off + 1) = g.toByte; base(off + 2) = r.toByte
    }
    base
  }

  test("BMP resize samples exact nearest-neighbour pixels and stays a valid BMP") {
    // 4x4 image whose pixel (x,y) encodes its own coordinates
    val src = bmpWithPixels(4, 4, (x, y) => (x * 10, y * 10, x + y))
    val out = MediaOps.resizeBmp(src, 2, 2).get
    val meta = MediaOps.sniff(1L, out)
    assert(meta.kind === "bmp" && meta.width === 2 && meta.height === 2 && meta.valid)
    // out pixel (x,y) should be src pixel (2x, 2y)
    val rowSize = ((24 * 2 + 31) / 32) * 4
    for (y <- 0 until 2; x <- 0 until 2) {
      val off = 54 + y * rowSize + x * 3
      assert((out(off) & 0xFF) === 2 * x * 10, s"B at ($x,$y)")
      assert((out(off + 1) & 0xFF) === 2 * y * 10, s"G at ($x,$y)")
      assert((out(off + 2) & 0xFF) === 2 * x + 2 * y, s"R at ($x,$y)")
    }
    // resized output itself resizes (round-trip through the public parser)
    assert(MediaOps.resizeBmp(out, 1, 1).isDefined)
    // non-BMP input quarantines
    assert(MediaOps.resizeBmp("plain text".getBytes, 2, 2).isEmpty)
  }

  test("BMP channel means are exact over planted pixels") {
    val src = bmpWithPixels(2, 2, (x, y) => (10, 20, 30 + 2 * (x + y)))
    val (mb, mg, mr) = MediaOps.bmpChannelMeans(src).get
    assert(mb === 10.0 && mg === 20.0)
    assert(mr === (30.0 + 32 + 32 + 34) / 4)
  }

  test("distributed thumbnails: valid BMPs resized, others quarantined") {
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> bmpWithPixels(8, 8, (x, y) => (x, y, 0)),
      2L -> wav(44100, 2, 16, 10),
      3L -> bmpWithPixels(3, 5, (x, y) => (1, 2, 3))
    )
    val out = MediaOps.thumbnails(rows.toDS().repartition(2), 2, 2)
      .select("doc_id", "width", "valid")
      .as[(Long, Int, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) === ((2, true)))
    assert(out(2L) === ((-1, false)))
    assert(out(3L) === ((2, true)))
  }

  test("adversarial headers: Int-overflow chunk sizes and widths are quarantined") {
    // review finding: a RIFF chunk size near Int.MaxValue used to wrap the
    // walk cursor negative and throw; a BMP width of 178 956 971 used to
    // wrap bpp*w so rowSize passed the bounds check and pixel loops crashed
    val evilWav = {
      val b = java.nio.ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(52); b.put("WAVE".getBytes)
      b.put("JUNK".getBytes); b.putInt(0x7FFFFFF0) // huge declared chunk
      b.array()
    }
    val m = MediaOps.sniff(1L, evilWav)
    assert(m.kind === "wav" && !m.valid) // classified, never thrown
    val evilBmp = {
      val b = java.nio.ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte)
      b.putInt(128); b.putInt(0); b.putInt(54)
      b.putInt(40); b.putInt(178956971); b.putInt(1) // width wraps 24*w
      b.putShort(1); b.putShort(24)
      b.array()
    }
    assert(MediaOps.resizeBmp(evilBmp, 2, 2).isEmpty)
    assert(MediaOps.bmpChannelMeans(evilBmp).isEmpty)
    val minHeightBmp = bmp(4, 4)
    java.nio.ByteBuffer.wrap(minHeightBmp).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue) // |h| overflows abs()
    assert(MediaOps.resizeBmp(minHeightBmp, 2, 2).isEmpty)
    assert(!MediaOps.sniff(2L, minHeightBmp).valid)
  }

  test("negative-height (top-down) BMP reports positive dimensions") {
    val topDown = bmp(32, -8)
    val m = MediaOps.sniff(9L, topDown)
    assert(m.width === 32 && m.height === 8 && m.valid)
  }

  test("payload body is never required — header-only slice decodes identically") {
    val full = wav(22050, 2, 16, 100000)
    val headerOnly = full.take(64)
    val a = MediaOps.sniff(1L, full)
    val b = MediaOps.sniff(1L, headerOnly)
    assert(a.sample_rate === b.sample_rate && a.channels === b.channels &&
      b.valid, "decode cost must be O(header), not O(bytes)")
  }
}
