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
