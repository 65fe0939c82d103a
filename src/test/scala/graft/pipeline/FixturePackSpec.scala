package graft.pipeline

import graft.SparkSpec

/** Pins the r22 packed fixture assembly (4 PCM samples / 8 raster bytes
  * per hex+lpad call) byte-for-byte against INDEPENDENT Scala byte
  * references — the staged media payloads feed every audio/image/video
  * query, so a packing slip would surface as oracle mismatches corpus-
  * wide; this spec catches it at the operator.
  */
class FixturePackSpec extends SparkSpec {
  import spark.implicits._

  // ---- WAV fixture reference (mono 16-bit PCM, 8 kHz) --------------------

  private def sampRef(d: Long, t: Long, v: Boolean): Long =
    ((d % 997 + 1) * t * t + (13 + d % 89) * t + d) % 4001 - 2000 +
      (if (v && t % 97 == 0) 3L else 0L)

  private def wavRef(d: Long, v: Boolean): Array[Byte] = {
    val n = (650 + (d % 5) * 65).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
    (0 until n).foreach(t => bb.putShort(sampRef(d, t.toLong, v).toShort))
    bb.array()
  }

  test("audioFpMediaOf packed assembly matches the independent byte reference") {
    // ids cover every n%4 arm (d%5 in 0..4) and d%10==0 variants
    val ids = (0L to 12L) :+ 101L :+ 777L :+ 1003L
    val out = PipelineQueries.audioFpMediaOf(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(out.size == ids.size + ids.count(_ % 10 == 0))
    ids.foreach { d =>
      assert(java.util.Arrays.equals(out(d), wavRef(d, v = false)), s"doc $d")
    }
    ids.filter(_ % 10 == 0).foreach { d =>
      assert(java.util.Arrays.equals(out(d + 1000000L), wavRef(d, v = true)),
        s"variant of $d")
    }
  }

  // ---- raster fixture reference (9x8 PGM / 24-bit BMP) -------------------

  private val W = 9
  private val H = 8
  private val bmpRow = ((W * 3 + 3) / 4) * 4 // 28

  private def pxRef(d: Long, x: Int, y: Int, isVar: Boolean): Long = {
    val idx = (y * W + x).toLong
    val k0 = (d * (W * H) + idx + 1) % 16777216
    val k1 = ((k0 * 2654435761L) / 256) % 16777216
    val k2 = ((k1 * 2654435761L) / 256) % 16777216
    val base = ((k2 * 2654435761L) / 65536) % 256
    if (isVar && x < W / 9 && y < H / 8) base / 2 + 64 else base
  }

  private def pgmRef(d: Long, isVar: Boolean): Array[Byte] =
    s"P5\n$W $H\n255\n".getBytes("US-ASCII") ++
      (0 until W * H).map(i => pxRef(d, i % W, i / W, isVar).toByte).toArray

  private def bmpRef(d: Long, isVar: Boolean): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val imgSize = bmpRow * H
    val hdr = Array[Byte]('B', 'M') ++ le32(54 + imgSize) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(W) ++ le32(H) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(imgSize) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val body = (0 until bmpRow * H).map { b =>
      if (b % bmpRow >= W * 3) 0.toByte
      else pxRef(d, (b % bmpRow) / 3, H - 1 - b / bmpRow, isVar).toByte
    }.toArray
    hdr ++ body
  }

  test("rasterPayload packed assembly matches the independent byte reference") {
    // both containers (even=BMP, odd=PGM), both variant arms, assorted seeds
    val rows = Seq(
      (2L, 5L, false), (3L, 5L, false), (4L, 4L, true), (7L, 7L, true),
      (10L, 0L, false), (11L, 0L, true), (100L, 9999L, false), (101L, 9999L, true))
    val out = PipelineQueries.rasterPayload(rows.toDF("media_id", "__d", "__v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    rows.foreach { case (mid, d, v) =>
      val want = if (mid % 2 == 0) bmpRef(d, v) else pgmRef(d, v)
      assert(java.util.Arrays.equals(out(mid), want), s"media $mid (seed $d, var $v)")
    }
  }
}
