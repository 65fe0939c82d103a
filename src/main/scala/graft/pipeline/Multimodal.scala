package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * The HEADER layer is real: [[parseDims]] extracts image dimensions
  * from actual PNG (IHDR chunk) and JPEG (SOF marker scan) byte streams
  * — pure byte arithmetic against the public container formats, no
  * media library needed. Full pixel decode (this container has no
  * codecs) stays behind the pluggable [[MediaDecoder]] seam with a
  * deterministic fake; the Spark-side plumbing — schema, batch shape,
  * partition-preserving mapPartitions — is real and tested either way.
  *
  * At scale: payloads stay columnar (parquet binary); decode runs
  * scan-side per partition (no shuffle); feature vectors come back as
  * fixed-width arrays so downstream similarity ops (Similarity.scala)
  * apply unchanged.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Double])

  /** Pluggable decoder. Production would wrap a real codec; the default is
    * a deterministic fake so pipelines are testable anywhere.
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake decoder: features = byte histogram moments.
    * (REAL decode would go here — e.g. JPEG → RGB moments.)
    */
  object FakeDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.payload
      val n = bytes.length.toLong
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val mean = if (n > 0) sum.toDouble / n else 0.0
      MediaFeatures(row.media_id, row.kind, n,
        java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString,
        Array(n.toDouble, mean))
    }
  }

  /** Wrap a text table as a media table (documents → utf-8 "payloads") —
    * the stand-in corpus for multimodal tests.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("int").as("sample_rate"))

  case class MediaDims(media_id: Long, fmt: String, width: Long, height: Long)

  /** Real image-header dimension extraction — the decode step every
    * multimodal ingest pipeline runs FIRST (resize planning, aspect
    * filtering, thumbnail routing) and the one that never needs a codec:
    * dimensions live in fixed offsets of the container header.
    *
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *    chunk (always first): 4-byte length (13), "IHDR", width and
    *    height as big-endian u32 at offsets 16 and 20.
    *  - JPEG: `FF D8` (SOI), then a marker-segment walk — each segment
    *    is `FF <marker>` + big-endian u16 length (inclusive of itself);
    *    the frame header (SOF0-SOF15 except DHT/JPG/DAC) carries
    *    precision(1), height(u16), width(u16) after the length.
    *  - GIF: "GIF87a"/"GIF89a" signature, then the logical screen
    *    descriptor: width and height as LITTLE-endian u16 at offsets 6
    *    and 8 (the one common format with LE dims — a byte-order mixup
    *    cannot survive the specs).
    *
    * Fail-fast on anything malformed (bad signature, truncated header,
    * missing SOF): a corrupt payload must surface at the decode stage
    * with its media identity, not flow NULL dimensions downstream.
    */
  def parseDims(bytes: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"parseDims: $msg (${bytes.length} bytes)")

    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length >= 2 && u8(0) == 0x89) {
      if (bytes.length < 24) fail("truncated PNG: no room for IHDR")
      if (!pngSig.indices.forall(i => u8(i) == pngSig(i))) fail("bad PNG signature")
      // IHDR must be the first chunk (PNG spec); its type sits at 12..15
      if (!(u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'))
        fail("first PNG chunk is not IHDR")
      val (w, h) = (u32(16), u32(20))
      if (w <= 0 || h <= 0) fail(s"PNG dimensions out of range: ${w}x$h")
      ("png", w.toInt, h.toInt)
    } else if (bytes.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
      var pos = 2
      while (pos + 3 < bytes.length) {
        if (u8(pos) != 0xff) fail(f"JPEG marker expected at offset $pos, got 0x${u8(pos)}%02x")
        var p = pos
        while (p < bytes.length && u8(p) == 0xff) p += 1 // fill bytes are legal
        if (p >= bytes.length) fail("truncated JPEG: dangling fill bytes")
        val marker = u8(p)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (p + 8 >= bytes.length) fail("truncated JPEG SOF segment")
          val (h, w) = (u16(p + 4), u16(p + 6))
          if (w == 0 || h == 0) fail(s"JPEG dimensions out of range: ${w}x$h")
          return ("jpeg", w, h)
        }
        if (marker == 0xd9 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01)
          fail("JPEG stream ended without a frame header (no SOF)")
        if (p + 2 >= bytes.length) fail("truncated JPEG segment length")
        val len = u16(p + 1)
        if (len < 2) fail(s"corrupt JPEG segment length $len")
        pos = p + 1 + len
        // a declared segment length overrunning the buffer is truncation,
        // not a clean no-SOF stream
        if (pos > bytes.length) fail("truncated JPEG: segment overruns the payload")
      }
      fail("JPEG stream ended without a frame header (no SOF)")
    } else if (bytes.length >= 6 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F') {
      val version = new String(bytes.slice(3, 6), "US-ASCII")
      if (version != "87a" && version != "89a") fail(s"unknown GIF version '$version'")
      if (bytes.length < 10) fail("truncated GIF: no logical screen descriptor")
      val (w, h) = (u16le(6), u16le(8))
      if (w == 0 || h == 0) fail(s"GIF dimensions out of range: ${w}x$h")
      ("gif", w, h)
    } else fail("unknown image format (no PNG/JPEG/GIF signature)")
  }

  case class AudioMeta(
      media_id: Long, fmt: String, channels: Long, sample_rate: Long,
      bits_per_sample: Long, n_samples: Long, duration_ms: Long)

  /** Real WAV/RIFF audio header extraction — the audio twin of
    * [[parseDims]], pure byte arithmetic against the public container:
    * "RIFF" + LE u32 size + "WAVE", then an even-aligned chunk walk; the
    * "fmt " chunk carries (audio_format, channels, sample_rate,
    * byte_rate, block_align, bits_per_sample) as LE fields, and the
    * "data" chunk's declared size, divided by block_align, is the sample
    * count (duration follows by integer arithmetic — no float, so the
    * metadata hashes cross-engine). PCM only (audio_format 1): that is
    * what a training pipeline stores at rest; compressed formats belong
    * behind the codec seam.
    *
    * Fail-fast on malformed input (bad magic, truncated chunk, declared
    * data overrunning the payload, zero block_align): corrupt audio must
    * surface at the decode stage with its media identity.
    */
  def parseAudio(bytes: Array[Byte]): AudioMeta = parseAudio(bytes, -1L)

  private def parseAudio(bytes: Array[Byte], mediaId: Long): AudioMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long =
      u16le(i).toLong | (u16le(i + 2).toLong << 16)
    def ascii(i: Int, n: Int): String = new String(bytes.slice(i, i + n), "US-ASCII")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"parseAudio: $msg (${bytes.length} bytes)")

    if (bytes.length < 12 || ascii(0, 4) != "RIFF") fail("not a RIFF container")
    if (ascii(8, 4) != "WAVE") fail(s"RIFF form is '${ascii(8, 4)}', not WAVE")
    var pos = 12
    var fmtSeen = false
    var channels = 0L; var sampleRate = 0L; var blockAlign = 0L; var bits = 0L
    var dataSize = -1L
    while (pos + 8 <= bytes.length && dataSize < 0) {
      val id = ascii(pos, 4)
      val size = u32le(pos + 4)
      val body = pos + 8
      id match {
        case "fmt " =>
          if (size < 16 || body + 16 > bytes.length) fail("truncated fmt chunk")
          val audioFormat = u16le(body)
          if (audioFormat != 1) fail(s"audio format $audioFormat is not PCM")
          channels = u16le(body + 2)
          sampleRate = u32le(body + 4)
          blockAlign = u16le(body + 12)
          bits = u16le(body + 14)
          if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || bits <= 0)
            fail(s"fmt fields out of range: ch=$channels sr=$sampleRate block=$blockAlign bits=$bits")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt chunk")
          if (body + size > bytes.length) fail("declared data size overruns the payload")
          dataSize = size
        case _ => // skip unknown chunk
          if (body + size > bytes.length) fail(s"chunk '$id' overruns the payload")
      }
      // EVERY chunk's declared size must fit the payload, re-checked here
      // in Long arithmetic before the advance regardless of which arm ran:
      // the fmt arm validates only its first 16 bytes, so a hostile fmt
      // size like 0xFFFFFFF8 (→ -8 under `.toInt`) would otherwise make
      // the advance a no-op (infinite executor loop) or drive `pos`
      // negative (AIOOBE escaping the fail-fast wrapper, losing the media
      // id). This bound also caps `size` < 2^31, so `size.toInt` is safe.
      if (body.toLong + size > bytes.length) fail(s"chunk '$id' overruns the payload")
      // RIFF chunks are word-aligned: odd sizes carry one pad byte
      if (dataSize < 0) pos = body + size.toInt + (size % 2).toInt
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (dataSize < 0) fail("no data chunk")
    val nSamples = dataSize / blockAlign
    AudioMeta(mediaId, "wav", channels, sampleRate, bits, nSamples,
      nSamples * 1000L / sampleRate)
  }

  /** Audio-metadata extraction over a media table — the [[imageDims]]
    * seam at audio granularity: payload bytes never shuffle, one parser
    * pass per row, corrupt rows fail with their media identity.
    */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        try parseAudio(payload, id)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"media_id=$id: ${e.getMessage}", e)
        }
      }).toDF()
  }

  case class VideoMeta(
      media_id: Long, fmt: String, width: Long, height: Long,
      timescale: Long, duration_ms: Long)

  /** Real MP4/ISO-BMFF header extraction — the video member of the
    * codec-free header triad ([[parseDims]] images, [[parseAudio]] audio):
    * a big-endian BOX walk. Top level must open with `ftyp`; `moov`
    * contains `mvhd` (movie timescale + duration — version 0 u32 fields
    * or version 1 u64) and `trak`/`tkhd` (track width/height as 16.16
    * fixed point at the end of the v0/v1 body). duration_ms =
    * duration × 1000 / timescale in integer arithmetic.
    *
    * The first video track (nonzero tkhd dims) wins; audio-only MP4s fail
    * (this seam feeds the FRAME-sampling plan — an item with no video
    * track must surface, not emit 0×0). Fail-fast on truncation, missing
    * boxes, or a box length overrunning the payload, always with enough
    * reason to debug a 100 TB ingest without the bytes in hand.
    */
  def parseVideo(bytes: Array[Byte]): VideoMeta = parseVideo(bytes, -1L)

  private def parseVideo(bytes: Array[Byte], mediaId: Long): VideoMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def ascii(i: Int, n: Int): String = new String(bytes.slice(i, i + n), "US-ASCII")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"parseVideo: $msg (${bytes.length} bytes)")

    // walk boxes in [from, until); call f(type, bodyStart, bodyEnd)
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val size = u32(pos)
        val typ = ascii(pos + 4, 4)
        val (body, end) =
          if (size == 1) {
            if (pos + 16 > until) fail(s"truncated largesize box '$typ'")
            val ls = u64(pos + 8)
            if (ls < 16 || pos + ls > until) fail(s"box '$typ' overruns the payload")
            (pos + 16, pos + ls.toInt)
          } else {
            if (size < 8 || pos + size > until) fail(s"box '$typ' overruns the payload")
            (pos + 8, pos + size.toInt)
          }
        f(typ, body, end)
        pos = end
      }
      if (pos != until) fail("trailing bytes are not a whole box")
    }

    if (bytes.length < 12 || ascii(4, 4) != "ftyp") fail("not an MP4 (no leading ftyp box)")
    var timescale = -1L; var duration = -1L
    var w = -1L; var h = -1L
    walk(0, bytes.length) { (typ, body, end) =>
      if (typ == "moov") walk(body, end) { (t2, b2, e2) =>
        if (t2 == "mvhd") {
          // the version byte itself needs a bound: an EMPTY mvhd box
          // (size 8) as the last box would read past the array here
          if (b2 >= e2) fail("truncated mvhd (empty box)")
          val ver = u8(b2)
          if (ver == 1) {
            // v1 layout: ver/flags(4) + times(16) + timescale(4 @20) +
            // duration(8 @24..31) — the u64 read ends at b2+31, so the
            // bound is 32 (a 28-byte bound let a crafted last-box mvhd
            // read past the buffer: AIOOBE escaping the fail-fast wrapper)
            if (b2 + 32 > e2) fail("truncated mvhd v1")
            timescale = u32(b2 + 20); duration = u64(b2 + 24)
          } else {
            if (b2 + 20 > e2) fail("truncated mvhd v0")
            timescale = u32(b2 + 12); duration = u32(b2 + 16)
          }
          if (timescale <= 0) fail(s"mvhd timescale out of range: $timescale")
        } else if (t2 == "trak") walk(b2, e2) { (t3, b3, e3) =>
          if (t3 == "tkhd" && w < 0) {
            if (b3 >= e3) fail("truncated tkhd (empty box)")
            val ver = u8(b3)
            val dimOff = b3 + (if (ver == 1) 88 else 76)
            if (dimOff + 8 > e3) fail(s"truncated tkhd v$ver")
            val (tw, th) = (u32(dimOff) >> 16, u32(dimOff + 4) >> 16)
            if (tw > 0 && th > 0) { w = tw; h = th } // else: non-video track
          }
        }
      }
    }
    if (timescale < 0) fail("no moov/mvhd box")
    if (w < 0) fail("no video track (every tkhd has zero dimensions)")
    VideoMeta(mediaId, "mp4", w, h, timescale, duration * 1000L / timescale)
  }

  /** Video-metadata extraction over a media table — the [[imageDims]]
    * seam at video granularity; feeds [[frameSamplePlan]] with REAL
    * container metadata instead of caller-supplied columns.
    */
  def videoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        try parseVideo(payload, id)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"media_id=$id: ${e.getMessage}", e)
        }
      }).toDF()
  }

  /** Header-dimension extraction over a media table: the same
    * partition-preserving typed-mapPartitions seam as [[extractFeatures]]
    * — payload bytes never shuffle, one parser pass per row.
    */
  def imageDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        try {
          val (fmt, w, h) = parseDims(payload)
          MediaDims(id, fmt, w.toLong, h.toLong)
        } catch {
          case e: IllegalArgumentException =>
            // re-raise with the media identity: at 100 TB "some payload
            // was corrupt" is undebuggable without the row key
            throw new IllegalArgumentException(s"media_id=$id: ${e.getMessage}", e)
        }
      }).toDF()
  }

  /** The real header parser behind the pluggable decoder seam: features =
    * [width, height] from [[parseDims]] (full pixel decode would extend
    * this with a codec).
    */
  object HeaderDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val (_, w, h) = parseDims(row.payload)
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(row.payload).map("%02x".format(_)).mkString,
        Array(w.toDouble, h.toDouble))
    }
  }

  /** Decode/feature-extract stage: partition-preserving, batched.
    * This is the seam where a Pandas-UDF/mapInPandas equivalent would sit;
    * in Scala it is a typed mapPartitions (one decoder instance per
    * partition, streaming through rows).
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(decoder.decode)
    }.toDF()
  }

  /** Letterbox ("contain") resize PLAN over an [[imageDims]] frame: the
    * target geometry every image normalization pass needs, as pure integer
    * arithmetic — `scale_ppm = min(1e6, maxW*1e6 div w, maxH*1e6 div h)`
    * (downscale-only: a smaller-than-box image keeps its size), output
    * dims floored with a 1-pixel minimum so extreme aspect ratios cannot
    * collapse to zero. Scan-side projection, no shuffle, no FP — the same
    * plan on any engine produces identical geometry, so a distributed
    * resize is deterministic and resumable. The pixel resampling itself is
    * decoder-seam work ([[MediaDecoder]]); this operator decides WHAT to
    * decode into, which is the part that must be exact and auditable.
    *
    * In-plan guards: null/nonpositive dims raise with the media id
    * (corrupt-header rows must fail loudly, the [[parseDims]] discipline),
    * and dims are required < 2^32 (already guaranteed by the header
    * parsers' u32/u16 fields) so the ppm products stay inside a Long.
    */
  def resizePlan(dims: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val maxSide = Long.MaxValue / 1000000L
    require(maxW > 0 && maxW <= maxSide && maxH > 0 && maxH <= maxSide,
      s"resizePlan: target box must be in [1, $maxSide], got ${maxW}x$maxH")
    val missing = Seq("media_id", "width", "height").filterNot(dims.columns.contains)
    require(missing.isEmpty, s"columns absent from dims: ${missing.mkString(", ")}")
    val reserved = Seq("scale_ppm", "out_w", "out_h").filter(dims.columns.contains)
    require(reserved.isEmpty,
      s"dims columns collide with output names (rename them): ${reserved.mkString(", ")}")
    val guard = (c: String) => expr(
      s"""if($c is null or $c <= 0 or $c >= 4294967296L,
         |  cast(raise_error(concat('resizePlan: $c out of range for media_id ',
         |    cast(media_id as string))) as bigint),
         |  cast($c as bigint))""".stripMargin)
    dims
      .withColumn("width", guard("width"))
      .withColumn("height", guard("height"))
      .withColumn("scale_ppm", expr(
        s"least(1000000L, ${maxW}L * 1000000L div width, ${maxH}L * 1000000L div height)"))
      .withColumn("out_w", expr("greatest(1L, width * scale_ppm div 1000000L)"))
      .withColumn("out_h", expr("greatest(1L, height * scale_ppm div 1000000L)"))
  }

  /** Uniform frame-sampling PLAN for video media: k evenly spaced frame
    * indices per item — `idx_j = j * n_frames div k` with duplicates
    * collapsed (short clips yield fewer than k frames, never repeats), and
    * the exact millisecond seek position per index. One scan-side explode
    * (fan-out <= k), integer arithmetic end to end; the frame EXTRACTION
    * is decoder-seam work — this is the deterministic sampling decision a
    * 100 TB video pipeline must be able to re-run and audit. fps is
    * milli-fps (29.97 fps = 29970) so NTSC-style rates stay exact.
    *
    * In-plan guards: null/negative duration or nonpositive fps raise with
    * the media id; duration <= 1e12 ms (~31 years) and fps <= 1e6 milli
    * (1000 fps) keep `duration * fps` inside a Long. Zero-frame media emit
    * no rows (a zero-length clip has no frame 0).
    *
    * @return idCol + (n_frames, frame_idx, t_ms)
    */
  def frameSamplePlan(
      media: DataFrame,
      k: Int,
      idCol: String = "media_id",
      durationCol: String = "duration_ms",
      fpsCol: String = "fps_milli"): DataFrame = {
    require(k > 0 && k <= 100000, s"frameSamplePlan: k must be in [1, 100000], got $k")
    val missing = Seq(idCol, durationCol, fpsCol).filterNot(media.columns.contains)
    require(missing.isEmpty, s"columns absent from media: ${missing.mkString(", ")}")
    val reserved = Seq("n_frames", "frame_idx", "t_ms").filter(media.columns.contains)
    require(reserved.isEmpty,
      s"media columns collide with output names (rename them): ${reserved.mkString(", ")}")
    media
      .withColumn("n_frames", expr(
        s"""if(`$durationCol` is null or `$durationCol` < 0 or `$durationCol` > 1000000000000L
           |   or `$fpsCol` is null or `$fpsCol` <= 0 or `$fpsCol` > 1000000L,
           |  cast(raise_error(concat('frameSamplePlan: duration/fps out of range for $idCol ',
           |    cast(`$idCol` as string))) as bigint),
           |  cast(`$durationCol` as bigint) * cast(`$fpsCol` as bigint) div 1000000L)"""
          .stripMargin))
      .withColumn("frame_idx", explode(expr(
        s"""if(n_frames <= 0, array(),
           |  array_distinct(transform(sequence(0L, ${k - 1}L), j -> j * n_frames div ${k}L)))"""
          .stripMargin)))
      .withColumn("t_ms", expr(s"frame_idx * 1000000L div cast(`$fpsCol` as bigint)"))
      .select(col(idCol), col("n_frames"), col("frame_idx"), col("t_ms"))
  }
}
