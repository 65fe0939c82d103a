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
}
