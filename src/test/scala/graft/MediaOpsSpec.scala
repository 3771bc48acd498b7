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
