package graft.streaming

import graft.SparkSpec
import graft.pipeline.TextAnalysis
import graft.tables.Tables

/** The streaming session-document assembler must agree with the batch twin
  * (gap-convention alignment included) and emit each closed session exactly
  * once in append mode.
  */
class SessionAssemblerSpec extends SparkSpec {
  import spark.implicits._

  test("batch mode == TextAnalysis.sessionDocs on the sf0.001 feed (gap conventions aligned)") {
    val ticks = Tables.ticks(spark, "/root/testdata/sf0.001")
    val want = TextAnalysis.sessionDocs(ticks, gapSeconds = 1800L)
      .select("symbol", "session_start", "session_end", "n_events", "doc_md5")
      .collect().map(_.toSeq).toSet
    val got = SessionAssembler.sessionDocsStream(ticks, gapSeconds = 1800L)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"stream-form batch run != sessionDocs: ${got.size} vs ${want.size} sessions; " +
        s"sample diff ${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("append-mode stream emits every closed session exactly once, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("u1", 100L, 1L, "view", 10L),
      ("u1", 1900L, 2L, "click", 20L),   // diff 1800 == gap: SAME session (batch convention)
      ("u1", 3702L, 3L, "view", 30L),    // diff 1802 > gap: new session
      ("u2", 50L, 4L, "buy", 40L))
    val sentinel = ("zz", 1000000L, 99L, "noop", 0L) // advances the watermark past all ends
    val cols = Seq("symbol", "secs", "event_id", "event_type", "price_micros")
    val want = SessionAssembler.sessionDocsStream(rows.toDF(cols: _*), gapSeconds = 1800L)
      .collect().map(_.toSeq).toSet
    assert(want.size == 3, s"fixture sanity: $want")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long, String, Long)]
    val q = SessionAssembler.sessionDocsStream(input.toDF().toDF(cols: _*), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("session_docs_out").outputMode("append").start()
    try {
      input.addData(rows.take(2)); q.processAllAvailable()
      input.addData(rows.drop(2)); q.processAllAvailable()
      input.addData(Seq(sentinel)); q.processAllAvailable()
      // one more batch so the watermark computed from the sentinel closes
      // the open sessions (watermarks propagate at the NEXT micro-batch)
      input.addData(Seq(sentinel.copy(_3 = 100L))); q.processAllAvailable()
      val got = spark.table("session_docs_out")
        .where($"symbol" =!= "zz").collect().map(_.toSeq)
      assert(got.toSet == want,
        s"stream sessions != batch:\ngot  ${got.toSet}\nwant $want")
      assert(got.length == got.toSet.size, "append mode must emit each session once")
    } finally q.stop()
  }
}
