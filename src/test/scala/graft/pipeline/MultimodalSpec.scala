package graft.pipeline

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table schema + typed mapPartitions decode seam") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.columns.toSeq ==
      Seq("media_id", "kind", "payload", "width", "height", "sample_rate"))
    val features = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(features.length == 2)
    val r0 = features(0)
    assert(r0.getAs[Long]("n_bytes") == 5L)
    assert(r0.getAs[String]("checksum") == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    // utf-8 payloads: ö is 2 bytes
    assert(features(1).getAs[Long]("n_bytes") == 6L)
    // feature vector shape: [n_bytes, byte-mean]
    val vec = r0.getSeq[Double](r0.fieldIndex("features"))
    assert(vec.length == 2 && vec.head == 5.0)
  }

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("parseDims: real PNG IHDR and JPEG SOF byte streams round-trip") {
    // hand-assembled 640x480 PNG: signature + IHDR(len 13) + dims + tail
    val png = hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000280" + "000001E0" + "0802000000" + "DEADBEEF")
    assert(Multimodal.parseDims(png) == (("png", 640, 480)))
    // JPEG: SOI + APP0(JFIF) + SOF0 with height 17, width 4097 (byte-order
    // sensitive values: a LE/BE mixup cannot pass)
    val jpeg = hexBytes(
      "FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "00480048" + "0000" +
        "FFC0" + "0011" + "08" + "0011" + "1001" + "03" + "011100" + "021101" + "031101")
    assert(Multimodal.parseDims(jpeg) == (("jpeg", 4097, 17)))
    // SOF2 (progressive) is a frame header too
    val progressive = jpeg.updated(22, 0xc2.toByte)
    assert(Multimodal.parseDims(progressive) == (("jpeg", 4097, 17)))
    // GIF89a: LITTLE-endian screen descriptor — 0x0140 x 0x00F0 stored
    // byte-swapped (an endianness mixup would read 320x240 as 16385x61440)
    val gif = hexBytes("474946383961" + "4001" + "F000" + "000000")
    assert(Multimodal.parseDims(gif) == (("gif", 320, 240)))
  }

  test("parseDims: corrupt headers fail fast with the reason") {
    def failsWith(bytes: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.parseDims(bytes))
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    failsWith(hexBytes("89504E470D0A1A0B" + "0000000D" + "49484452" + "00" * 16),
      "bad PNG signature")
    failsWith(hexBytes("89504E470D0A1A0A" + "00000000"), "truncated PNG")
    failsWith(hexBytes("89504E470D0A1A0A" + "0000000D" + "49444154" + "00" * 16),
      "not IHDR")
    failsWith(hexBytes("FFD8FFD9"), "no SOF") // SOI + EOI: no frame header
    failsWith(hexBytes("FFD8FFE00010"), "truncated JPEG")
    failsWith(hexBytes("474946383961" + "4001"), "truncated GIF")
    failsWith(hexBytes("474946383761".dropRight(2) + "62"), "unknown GIF version") // "GIF87b"
    failsWith(hexBytes("CAFEBABE"), "unknown image format")
  }

  test("imageDims: the mapPartitions seam surfaces the failing media_id") {
    val media = Seq((7L, Array[Byte](0x42, 0x42))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.imageDims(media).collect()
    }
    assert(e.getCause != null && String.valueOf(e.getCause.getMessage).contains("media_id=7"))
  }

  test("HeaderDecoder: the real parser rides the pluggable decoder seam") {
    val png = hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000010" + "00000020" + "0802000000" + "DEADBEEF")
    val media = Seq((1L, "image", png, None: Option[Int], None: Option[Int], None: Option[Int]))
      .toDF("media_id", "kind", "payload", "width", "height", "sample_rate")
    val out = Multimodal.extractFeatures(media, Multimodal.HeaderDecoder).collect()(0)
    val features = out.getSeq[Double](out.fieldIndex("features"))
    assert(features == Seq(16.0, 32.0))
  }

  test("a custom decoder plugs into the same seam") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val constant = new Multimodal.MediaDecoder {
      def decode(row: Multimodal.MediaRow): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(row.media_id, row.kind, -1L, "x", Array(42.0))
    }
    val out = Multimodal.extractFeatures(Multimodal.asMediaTable(docs), constant).collect()(0)
    assert(out.getAs[Long]("n_bytes") == -1L && out.getAs[String]("checksum") == "x")
  }

  // ------------------------------------------------------ resize geometry

  test("resizePlan: contain-fit never exceeds the box, never upscales, preserves aspect; corrupt dims raise") {
    val dims = Seq(
      (1L, 800L, 600L),   // downscale, width-limited (800/320 > 600/240? equal -> both)
      (2L, 100L, 50L),    // fits -> passthrough
      (3L, 5000L, 2L),    // extreme aspect: height floors to the 1-px minimum
      (4L, 320L, 240L)).  // exact fit -> passthrough
      toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(dims, maxW = 320L, maxH = 240L)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("scale_ppm"), r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))).toMap
    // never exceeds the box, never upscales
    out.values.foreach { case (s, w, h) =>
      assert(s <= 1000000L && w <= 320 && h <= 240)
    }
    // passthrough for images already inside the box
    assert(out(2L) == ((1000000L, 100L, 50L)) && out(4L) == ((1000000L, 320L, 240L)))
    // 800x600 -> exactly 320x240 (scale = 400000 ppm on both axes)
    assert(out(1L) == ((400000L, 320L, 240L)))
    // extreme aspect: height floors to 1, never 0
    assert(out(3L)._3 == 1L)
    // aspect preserved within floor tolerance: |out_w*h - out_h*w| < w + h
    out.foreach { case (id, (_, ow, oh)) =>
      val (w0, h0) = dims.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap.apply(id)
      assert(math.abs(ow * h0 - oh * w0) <= w0 + h0, s"aspect drift for $id")
    }
    val bad = Seq((9L, 0L, 10L)).toDF("media_id", "width", "height")
    val e = intercept[Exception] {
      Multimodal.resizePlan(bad, 320L, 240L).collect()
    }
    assert(e.getMessage.contains("out of range"), s"got: ${e.getMessage}")
  }

  // ------------------------------------------------------ frame sampling

  test("frameSamplePlan: k uniform frames, short-clip collapse, zero-length silence, exact NTSC seeks") {
    val media = Seq(
      (1L, 10000L, 30000L),  // 10 s @ 30 fps -> 300 frames, 8 samples
      (2L, 100L, 30000L),    // 3 frames < k -> exactly 3 samples (no repeats)
      (3L, 0L, 30000L),      // zero-length -> no rows
      (4L, 1000L, 23976L)).  // 1 s NTSC -> 23 frames
      toDF("media_id", "duration_ms", "fps_milli")
    val out = Multimodal.frameSamplePlan(media, k = 8).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("frame_idx"), r.getAs[Long]("t_ms")))
    val byId = out.groupBy(_._1)
    assert(!byId.contains(3L), "zero-length media must emit no frames")
    assert(byId(1L).length == 8 && byId(2L).length == 3)
    byId.values.foreach { rows =>
      val idxs = rows.map(_._3).toSeq
      assert(idxs == idxs.sorted.distinct, "frame indices must be strictly increasing")
      rows.foreach { case (_, n, i, _) => assert(i >= 0 && i < n) }
    }
    // NTSC seek positions are exact integer milliseconds of idx/23.976
    byId(4L).foreach { case (_, _, i, t) => assert(t == i * 1000000L / 23976L) }
    // deterministic re-run
    val again = Multimodal.frameSamplePlan(media, k = 8).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("frame_idx"), r.getAs[Long]("t_ms")))
    assert(out.sortBy(t => (t._1, t._3)).toSeq == again.sortBy(t => (t._1, t._3)).toSeq)
    // out-of-range metadata raises with the media id
    val bad = Seq((7L, -5L, 30000L)).toDF("media_id", "duration_ms", "fps_milli")
    val e = intercept[Exception] {
      Multimodal.frameSamplePlan(bad, k = 8).collect()
    }
    assert(e.getMessage.contains("out of range"), s"got: ${e.getMessage}")
  }

  // ---------------------------------------------------------------- audio

  /** Minimal valid PCM WAV: fmt + data chunks, LE fields. */
  private def wav(
      channels: Int, sampleRate: Int, bits: Int, nSamples: Int,
      fmtTag: Int = 1, extraChunk: Boolean = false): Array[Byte] = {
    val block = channels * bits / 8
    val dataSize = nSamples * block
    val bb = java.nio.ByteBuffer.allocate(200 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    if (extraChunk) { bb.put("LIST".getBytes); bb.putInt(3); bb.put(Array[Byte](1, 2, 3, 0)) }
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(fmtTag.toShort); bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * block); bb.putShort(block.toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataSize); bb.put(new Array[Byte](dataSize))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("parseAudio: real RIFF/WAVE streams round-trip, incl. odd-size chunk padding") {
    val m = Multimodal.parseAudio(wav(2, 44100, 16, 1000))
    assert((m.fmt, m.channels, m.sample_rate, m.bits_per_sample, m.n_samples, m.duration_ms) ==
      (("wav", 2L, 44100L, 16L, 1000L, 22L))) // 1000*1000/44100 = 22 integer ms
    // an unknown odd-sized chunk before fmt must be skipped with padding
    val withList = Multimodal.parseAudio(wav(1, 8000, 16, 400, extraChunk = true))
    assert(withList.n_samples == 400L && withList.sample_rate == 8000L)
  }

  test("parseAudio: corrupt audio fails fast with the reason") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.parseAudio(b)).getMessage
    assert(msg("notRIFFatall0".getBytes).contains("not a RIFF"))
    val good = wav(1, 8000, 16, 10)
    assert(msg(java.util.Arrays.copyOf(good, 30)).contains("truncated fmt"))
    // declared data size beyond the payload = truncation
    assert(msg(java.util.Arrays.copyOf(good, good.length - 4))
      .contains("overruns the payload"))
    // non-PCM belongs behind the codec seam, not silent acceptance
    assert(msg(wav(1, 8000, 16, 10, fmtTag = 3)).contains("not PCM"))
    // AVI is RIFF but not WAVE
    val avi = good.clone(); "AVI ".getBytes.copyToArray(avi, 8)
    assert(msg(avi).contains("not WAVE"))
  }

  test("parseAudio: hostile 32-bit chunk sizes fail fast, never stall or escape the wrapper") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.parseAudio(b)).getMessage
    // fmt size 0xFFFFFFF8 → toInt = -8 would make the chunk advance a
    // no-op (pos = body - 8 = pos): an infinite executor loop on
    // adversarial ingest before the bound check existed
    def withChunkSize(at: Int, size: Long): Array[Byte] = {
      val b = wav(1, 8000, 16, 10).clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(at, size.toInt)
      b
    }
    // fmt chunk header sits at pos 12; its size field at 16
    assert(msg(withChunkSize(16, 0xFFFFFFF8L)).contains("overruns the payload"))
    // a value that would drive pos negative (AIOOBE without the guard)
    assert(msg(withChunkSize(16, 0x80000000L)).contains("overruns the payload"))
    // an unknown chunk with a hostile size fails the same way: replace the
    // fmt tag so the size is consumed by the skip arm
    val unk = withChunkSize(16, 0xFFFFFFF8L)
    "junk".getBytes.copyToArray(unk, 12)
    assert(msg(unk).contains("overruns the payload"))
  }

  // ---------------------------------------------------------------- video

  /** Minimal MP4: ftyp + moov[mvhd(v0|v1) + trak[tkhd]] big-endian. */
  private def mp4(
      timescale: Int, duration: Long, w: Int, h: Int,
      mvhdV1: Boolean = false, videoTrack: Boolean = true): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length); bb.put(typ.getBytes); bb.put(body); bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(if (mvhdV1) 112 else 100)
      bb.putInt(if (mvhdV1) 0x01000000 else 0)
      if (mvhdV1) { bb.putLong(0L); bb.putLong(0L); bb.putInt(timescale); bb.putLong(duration) }
      else { bb.putInt(0); bb.putInt(0); bb.putInt(timescale); bb.putInt(duration.toInt) }
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
      bb.putLong(0L) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      (1 to 6).foreach(_ => bb.putInt(0)); bb.putInt(1)
      bb.array()
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(7); bb.putInt(0); bb.putInt(0); bb.putInt(1); bb.putInt(0)
      bb.putInt(duration.toInt); bb.putLong(0L)
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(if (videoTrack) w << 16 else 0)
      bb.putInt(if (videoTrack) h << 16 else 0)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0))
    ftyp ++ box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  test("parseVideo: real MP4 box trees round-trip, v0 and v1 mvhd") {
    val m = Multimodal.parseVideo(mp4(30000, 90000L, 1920, 1080))
    assert((m.fmt, m.width, m.height, m.timescale, m.duration_ms) ==
      (("mp4", 1920L, 1080L, 30000L, 3000L)))
    val v1 = Multimodal.parseVideo(mp4(1000, 4500L, 640, 480, mvhdV1 = true))
    assert((v1.width, v1.height, v1.duration_ms) == ((640L, 480L, 4500L)))
  }

  test("parseVideo: corrupt/audio-only MP4 fails fast with the reason") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.parseVideo(b)).getMessage
    assert(msg("definitely not an mp4!".getBytes).contains("no leading ftyp"))
    assert(msg(mp4(1000, 100L, 10, 10, videoTrack = false)).contains("no video track"))
    val good = mp4(1000, 100L, 10, 10)
    assert(msg(java.util.Arrays.copyOf(good, good.length - 6)).contains("overruns"))
  }

  test("parseVideo: a crafted 28-byte mvhd v1 as the LAST box fails fast, never reads past the buffer") {
    // v1's duration u64 ends at body+31; a 28-byte body passed the old
    // 28-byte bound and the read ran off the end of the array (AIOOBE
    // escaping the fail-fast wrapper — the parseAudio hostile-size class)
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length); bb.put(typ.getBytes); bb.put(body); bb.array()
    }
    val mvhd28 = java.nio.ByteBuffer.allocate(28)
      .putInt(0x01000000).putLong(0L).putLong(0L).putInt(1000).array()
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0))
    val bad = ftyp ++ box("moov", box("mvhd", mvhd28))
    val e = intercept[IllegalArgumentException](Multimodal.parseVideo(bad))
    assert(e.getMessage.contains("truncated mvhd v1"), s"got: ${e.getMessage}")
    // an EMPTY mvhd box (size 8, no version byte) as the last box: the
    // version read itself must be bounded
    val empty = ftyp ++ box("moov", box("mvhd", Array.emptyByteArray))
    val e2 = intercept[IllegalArgumentException](Multimodal.parseVideo(empty))
    assert(e2.getMessage.contains("truncated mvhd (empty box)"), s"got: ${e2.getMessage}")
    val emptyTk = ftyp ++ box("moov", box("trak", box("tkhd", Array.emptyByteArray)))
    val e3 = intercept[IllegalArgumentException](Multimodal.parseVideo(emptyTk))
    assert(e3.getMessage.contains("truncated tkhd (empty box)"), s"got: ${e3.getMessage}")
  }

  test("parseVideo composes with frameSamplePlan: container metadata feeds the sampler") {
    val media = Seq((1L, mp4(30000, 90000L, 1280, 720))).toDF("media_id", "payload")
    val meta = Multimodal.videoMeta(media)
      .withColumn("fps_milli",
        org.apache.spark.sql.functions.lit(29970L)) // fps comes from the stream-info seam
    val frames = Multimodal.frameSamplePlan(meta, k = 4).collect()
    assert(frames.length == 4 && frames.forall(_.getAs[Long]("t_ms") <= 3000L))
  }

  test("audioMeta: the mapPartitions seam surfaces the failing media_id") {
    val rows = Seq((5L, wav(1, 8000, 16, 10)), (6L, "junk".getBytes))
      .toDF("media_id", "payload")
    val e = intercept[Exception] { Multimodal.audioMeta(rows).collect() }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("media_id=6")), s"got: ${chain(e)}")
  }
}
