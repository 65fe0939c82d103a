package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native NFC expression: canonical composition, idempotency, null
  * passthrough, supplementary-plane safety, and the codegen path. All
  * Unicode fixtures are built from explicit escapes so composed vs
  * decomposed forms are unambiguous in source.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val eAcute = "\u00e9" // composed é
  private val eDec = "e\u0301" // e + COMBINING ACUTE

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(NfcNormalize.of(col("t"))).head.getString(0)

  test("decomposed sequences compose to canonical NFC") {
    assert(s"r${eDec}sum$eDec" != s"r${eAcute}sum$eAcute", "fixture must start decomposed")
    assert(nfc(s"r${eDec}sum$eDec") == s"r${eAcute}sum$eAcute")
    // already-composed text is unchanged
    assert(nfc(s"r${eAcute}sum$eAcute") == s"r${eAcute}sum$eAcute")
    // A + COMBINING RING (U+030A) composes to Å (U+00C5)
    assert(nfc("Ångström") == "Ångström")
  }

  test("idempotent, ASCII passthrough, supplementary plane intact, NULL in NULL out") {
    assert(nfc(nfc(eDec)) == nfc(eDec))
    assert(nfc("plain ascii text") == "plain ascii text")
    val emoji = new String(Character.toChars(0x1F600))
    assert(nfc(s"emoji $emoji ok") == s"emoji $emoji ok")
    assert(nfc("") == "")
    val out = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(NfcNormalize.of(col("t"))).head
    assert(out.isNullAt(0))
  }

  test("SQL registration + whole-stage codegen") {
    GraftExtensions.register(spark)
    // the decomposed bytes ride inside the SQL literal directly: Spark's
    // own chr() is MOD-256 (cannot build U+0301 — the same trap the BPE
    // decode fix removed), so building the fixture with it would test
    // nothing
    val got = spark.sql(s"SELECT nfc_normalize('r${eDec}s')").head.getString(0)
    assert(got == s"r${eAcute}s")
    // the expression must not break codegen: project over a non-foldable
    // source (a local literal table constant-folds to LocalTableScan and
    // proves nothing)
    val df = spark.range(1)
      .select(NfcNormalize.of(concat(col("id").cast("string"), lit(eDec))).as("n"))
    // the `*(n)` prefix marks a WholeStageCodegen span in the plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      s"expected a codegen'd projection:\n${df.queryExecution.executedPlan}")
    assert(df.head.getString(0) == s"0$eAcute")
  }

  test("normalizeDocs is streaming-legal: stateless scan over a MemoryStream == batch") {
    import graft.pipeline.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, s"r${eDec}sum$eDec  x"), (2L, "plain"), (3L, " pad "))
    val want = TextAnalysis.normalizeDocs(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TextAnalysis.normalizeDocs(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("norm_out").outputMode("append").start()
    try {
      input.addData(rows.take(1)); q.processAllAvailable()
      input.addData(rows.drop(1)); q.processAllAvailable()
      assert(spark.table("norm_out").collect().map(_.toSeq).toSet == want)
    } finally q.stop()
  }

  test("normalizeDocs: the full cleaning chain and the changed flag") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "clean text"),
      (2L, s"r${eDec}sum$eDec   spaced"), // decomposed + BEL + runs
      (3L, " lead and trail ")).toDF("doc_id", "text")
    val got = TextAnalysis.normalizeDocs(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0) == ((1L, md5("clean text"), 10L, false)))
    assert(got(1) == ((2L, md5(s"r${eAcute}sum$eAcute spaced"), 13L, true)))
    assert(got(2) == ((3L, md5("lead and trail"), 14L, true)))
  }
}
