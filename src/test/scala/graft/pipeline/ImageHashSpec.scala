package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  // ---- byte-level fixture builders (independent of the parser) ----------
  private def pgm(w: Int, h: Int, px: Seq[Int], comment: Boolean = false): Array[Byte] = {
    val hdr = if (comment) s"P5\n# a comment\n$w $h\n255\n" else s"P5\n$w $h\n255\n"
    hdr.getBytes("US-ASCII") ++ px.map(_.toByte).toArray
  }

  private def bmp(w: Int, h: Int, px: Seq[Int], bottomUp: Boolean = true,
      rgb: Int => (Int, Int, Int) = v => (v, v, v)): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val data = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val (r, g, b) = rgb(px(y * w + x))
      val i = srcRow * rowSize + x * 3
      data(i) = b.toByte; data(i + 1) = g.toByte; data(i + 2) = r.toByte
    }
    Array[Byte]('B', 'M') ++ le32(54 + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(if (bottomUp) h else -h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(data.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ data
  }

  test("parseRasterGray: PGM (incl. comments) and BMP (bottom-up, top-down, row padding) recover the same matrix") {
    val px = (0 until 9 * 8).map(i => (i * 37) % 256)
    val fromPgm = ImageHash.parseRasterGray(pgm(9, 8, px, comment = true))
    assert((fromPgm.fmt, fromPgm.width, fromPgm.height) == (("pgm", 9, 8)))
    assert(fromPgm.px.toSeq == px)
    // 9 wide -> 27-byte rows pad to 28: the padding walk is exercised
    val up = ImageHash.parseRasterGray(bmp(9, 8, px, bottomUp = true))
    val down = ImageHash.parseRasterGray(bmp(9, 8, px, bottomUp = false))
    assert(up.px.toSeq == px, "bottom-up BMP must be flipped to top-down")
    assert(down.px.toSeq == px, "negative-height BMP is already top-down")
  }

  test("parseRasterGray: BMP gray conversion uses the exact integer ITU-R 601 weights") {
    val got = ImageHash.parseRasterGray(
      bmp(9, 8, Seq.fill(72)(0), rgb = _ => (200, 100, 50)))
    assert(got.px.forall(_ == (299 * 200 + 587 * 100 + 114 * 50) / 1000))
  }

  test("parseRasterGray: malformed payloads fail loudly with a reason") {
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](ImageHash.parseRasterGray(bytes)).getMessage
    assert(msg("P5\n9 8\n65535\n".getBytes ++ new Array[Byte](144)).contains("maxval"))
    assert(msg(pgm(9, 8, Seq.fill(72)(1)).dropRight(10)).contains("truncated PGM pixel"))
    assert(msg(bmp(9, 8, Seq.fill(72)(1)).dropRight(10)).contains("overruns"))
    assert(msg(Array[Byte]('X', 'Y', 'Z')).contains("unknown raster format"))
    val paletted = bmp(9, 8, Seq.fill(72)(1))
    paletted(28) = 8 // bpp field
    assert(msg(paletted).contains("not 24"))
  }

  test("dHash: pure horizontal gradients saturate the bit field; aHash splits a column ramp at the mean") {
    // 9x8, px = x*16: every left block < right block -> all 64 bits set
    val inc = (for (y <- 0 until 8; x <- 0 until 9) yield x * 16)
    assert(ImageHash.dHash64(inc.toArray, 9, 8) == -1L)
    val dec = (for (y <- 0 until 8; x <- 0 until 9) yield (8 - x) * 16)
    assert(ImageHash.dHash64(dec.toArray, 9, 8) == 0L)
    // 8x8, px = x*32: block means 0,32..224, global mean 112 -> bits set
    // exactly for columns 4..7 of every row: 0xF0 per row byte
    val ramp = (for (y <- 0 until 8; x <- 0 until 8) yield x * 32)
    assert(ImageHash.aHash64(ramp.toArray, 8, 8) == 0xF0F0F0F0F0F0F0F0L)
  }

  test("hashes are container-invariant: the same pixels via PGM and BMP hash identically") {
    val px = (0 until 72 * 16).map(i => (i * i + 17 * i) % 251)
    val a = ImageHash.parseRasterGray(pgm(72, 16, px))
    val b = ImageHash.parseRasterGray(bmp(72, 16, px))
    assert(ImageHash.dHash64(a.px, 72, 16) == ImageHash.dHash64(b.px, 72, 16))
    assert(ImageHash.aHash64(a.px, 72, 16) == ImageHash.aHash64(b.px, 72, 16))
  }

  test("a raster smaller than the hash grid fails instead of hashing garbage") {
    val e = intercept[IllegalArgumentException](
      ImageHash.dHash64(Array.fill(8 * 8)(1), 8, 8)) // dHash needs w >= 9
    assert(e.getMessage.contains("smaller than"))
  }

  test("perturbed-pixel near-dup: one-block perturbation stays within distance 1 and the banded join catches it") {
    val base = (0 until 72 * 16).map(i => ((i * 2654435761L) % 16777216 * 7919 % 256).toInt)
    // perturb ONLY dHash block (0,0): x<8, y<2
    val pert = base.zipWithIndex.map { case (v, i) =>
      if (i % 72 < 8 && i / 72 < 2) v / 2 + 64 else v }
    val h1 = ImageHash.dHash64(base.toArray, 72, 16)
    val h2 = ImageHash.dHash64(pert.toArray, 72, 16)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 1, "perturbation is confined to one comparison")
    // a third, unrelated raster must NOT pair with either
    val other = (0 until 72 * 16).map(i => ((i * 40503L + 77) % 16777216 * 104729 % 256).toInt)
    val h3 = ImageHash.dHash64(other.toArray, 72, 16)
    val hashes = Seq((1L, h1), (2L, h2), (3L, h3)).toDF("media_id", "dhash")
    val pairs = ImageHash.imageNearDups(hashes, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("imagePhash: end-to-end over a media frame; corrupt rows carry their media identity") {
    val px = (0 until 72 * 16).map(i => (i * 31) % 256)
    val media = Seq((5L, pgm(72, 16, px)), (6L, bmp(72, 16, px))).toDF("media_id", "payload")
    val got = ImageHash.imagePhash(media).orderBy("media_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("pgm", "bmp"))
    assert(got(0).getLong(4) == got(1).getLong(4) && got(0).getLong(5) == got(1).getLong(5),
      "container must not leak into the hash")
    val bad = Seq((99L, Array[Byte]('B', 'M', 0))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException](ImageHash.imagePhash(bad).collect())
    assert(e.getCause.getMessage.contains("media_id=99"))
  }

  test("imageNearDups: wider radii are rejected (no silent recall cliff past the banding guarantee)") {
    val e = intercept[IllegalArgumentException](
      ImageHash.imageNearDups(Seq((1L, 0L)).toDF("media_id", "dhash"), maxDist = 5))
    assert(e.getMessage.contains("distance 3"))
  }

  test("phashStoreMatches: probe batch matches the store within distance, one row per pair, novel content silent") {
    // store hashes chosen so band structure is exercised: h2 differs from
    // h1 in exactly bits 0 and 17 (bands 0 and 1 touched, bands 2-3 agree)
    val h1 = 0x0123456789ABCDEFL
    val h2 = h1 ^ 1L ^ (1L << 17)
    val far = ~h1 // distance 64
    val store = Seq((10L, 100L, h1), (11L, 100L, far))
      .toDF("store_id", "cluster_id", "dhash")
    val probe = Seq((1L, h2), (2L, 0x7777000011112222L)).toDF("media_id", "dhash")
    val got = ImageHash.phashStoreMatches(probe, store, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // exactly ONE row for the (1, 10) pair despite agreeing on TWO bands
    // (the row-local first-common-band dedup), carrying the store cluster
    assert(got == Seq((1L, 10L, 100L, 2L)), s"got $got")
    // guard: wider radius than the banding guarantee is rejected
    val e = intercept[IllegalArgumentException](
      ImageHash.phashStoreMatches(probe, store, maxDist = 9))
    assert(e.getMessage.contains("distance 3"))
    // guard: a store without the contract columns fails fast
    val e2 = intercept[IllegalArgumentException](
      ImageHash.phashStoreMatches(probe, Seq((1L, 1L)).toDF("store_id", "dhash")))
    assert(e2.getMessage.contains("cluster_id"))
  }

  test("frameSetNearDups: frame matches lift to video pairs; thresholds and rollups exact") {
    // video 1: frames with hashes A B C D; video 2 shares A B C (one
    // near, two exact); video 3 shares only D; video 4 shares nothing
    val A = 0x1111L; val B = 0x2222L; val C = 0x4444L; val D = 0x8888L
    val frames = Seq(
      (1L, 0L, A), (1L, 1L, B), (1L, 2L, C), (1L, 3L, D),
      (2L, 0L, A ^ 1L), (2L, 1L, B), (2L, 2L, C), (2L, 3L, 0xF0F0L),
      (3L, 0L, D), (3L, 1L, 0x0F0FL), (3L, 2L, 0x3C3CL), (3L, 3L, 0xC3C3L),
      (4L, 0L, 0xAAAAL << 16), (4L, 1L, 0x5555L << 16), (4L, 2L, 0x9999L << 16),
      (4L, 3L, 0x6666L << 16)
    ).toDF("video_id", "frame_no", "dhash")
    val got = ImageHash.frameSetNearDups(frames, minFramesHit = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // (1,2): frames 0 (dist 1), 1 and 2 (dist 0) → hit 3, min 0;
    // (1,3): only one frame matches → below minFramesHit, excluded
    assert(got == Set((1L, 2L, 3L, 0L)))
    // at minFramesHit = 1 the single-frame pair surfaces
    val loose = ImageHash.frameSetNearDups(frames, minFramesHit = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(loose.contains((1L, 3L, 1L, 0L)) && loose.contains((1L, 2L, 3L, 0L)))
    // a frame pair agreeing on MULTIPLE bands (identical hashes agree on
    // all 4) still counts once — frames_hit is distinct frames
    assert(loose.filter(p => p._1 == 1L && p._2 == 2L).head._3 == 3L)
    intercept[IllegalArgumentException](ImageHash.frameSetNearDups(frames, minFramesHit = 0))
    intercept[IllegalArgumentException](ImageHash.frameSetNearDups(frames, maxDist = 4))
  }
}
