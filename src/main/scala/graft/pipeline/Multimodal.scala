package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * The actual codec (image/audio decode) is STUBBED behind
  * [[MediaDecoder]] — this container has no media libraries — but the
  * Spark-side plumbing is real and tested: schema, batch shape,
  * partition-preserving mapPartitions, and the deterministic fake decoder
  * used by the oracle query.
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
}
