package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff: all four statuses; summary counts agree") {
    val older = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val newer = Seq((1L, "same"), (2L, "changed bytes"), (4L, "brand new")).toDF("doc_id", "text")
    val got = Versioning.corpusDiff(older, newer).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val sums = Versioning.corpusDiffSummary(older, newer).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
    // a NULL-text doc present on BOTH sides is changed/unchanged, never
    // added/removed (presence rides explicit flags, not hash nullability)
    val oN = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nN = Seq((7L, "now has text")).toDF("doc_id", "text")
    assert(Versioning.corpusDiff(oN, nN).head.getString(1) == "changed")
    assert(Versioning.corpusDiff(oN, oN).head.getString(1) == "unchanged")
  }

  test("corpusDiff: a duplicated id fails LOUDLY instead of fanning out through the join") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val clean = Seq((1L, "a"), (2L, "c")).toDF("doc_id", "text")
    val e = intercept[Exception] { Versioning.corpusDiff(dup, clean).collect() }
    assert(e.getMessage.contains("duplicate doc_id"), s"got: ${e.getMessage}")
    val e2 = intercept[Exception] { Versioning.corpusDiff(clean, dup).collect() }
    assert(e2.getMessage.contains("newer snapshot"), s"got: ${e2.getMessage}")
  }

  test("embeddingDrift: exact integer-ppm means incl. negatives; null vectors excluded; subset drop shifts the mean") {
    // 2-dim vectors; ppm = floor(x * 1e6): -0.5 -> -500000, 0.25 -> 250000
    val older = Seq(
      (1L, Seq(-0.5f, 0.25f)),
      (2L, Seq(0.25f, 0.25f)),
      (3L, null.asInstanceOf[Seq[Float]]), // excluded, never poisons
      (4L, Seq(-0.5f, -0.5f))).toDF("vec_id", "embedding")
    val newer = older.where(col("vec_id") =!= 4L) // drop the negative outlier
    val got = Versioning.embeddingDrift(older, newer).orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // old dim0: (-500000 + 250000 - 500000) / 3 = -250000 exactly
    // new dim0: (-500000 + 250000) / 2 = -125000 exactly
    // old dim1: (250000 + 250000 - 500000) / 3 = 0
    // new dim1: (250000 + 250000) / 2 = 250000
    assert(got == Seq(
      (0L, -250000L, -125000L, 125000L),
      (1L, 0L, 250000L, 250000L)), s"got $got")
    // an embedding-WIDTH change is VISIBLE: the wider side's extra dims
    // appear with a NULL mean on the narrow side (never silently dropped)
    val narrow = Seq((1L, Seq(0.25f))).toDF("vec_id", "embedding")
    val wide = Seq((1L, Seq(0.25f, 0.25f))).toDF("vec_id", "embedding")
    val drift = Versioning.embeddingDrift(narrow, wide).orderBy("dim").collect()
    assert(drift.length == 2, "extra dims must surface as rows")
    assert(drift(1).isNullAt(1) && drift(1).getLong(2) == 250000L && drift(1).isNullAt(3),
      "the width mismatch must read as a NULL-mean row, not vanish")
  }
}
