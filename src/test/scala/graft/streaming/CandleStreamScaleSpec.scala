package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.CandleAggregator._
import graft.tables.Tables

/** Bar construction at bench scale: the full sf0.1 tick feed (100k ticks)
  * through the WATERMARKED streaming aggregation — delivered in many
  * micro-batches with the watermark advancing between them — must close
  * exactly the bars the batch R1 aggregation computes over the same ticks.
  *
  * Complements CandleAggregatorSpec (small fixtures, late-data semantics)
  * and StreamingScaleEndToEndSpec (the gate data plane): this is the
  * stateful windowed-aggregation path, where append-mode finality (the
  * CandleUpdate is_final contract) has to hold across thousands of
  * (symbol, hour) windows and a dozen watermark advances.
  */
class CandleStreamScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.1"

  test("sf0.1 feed: watermarked append-mode bars == batch aggregation") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir not present")

    // event time at MICROsecond precision: (symbol, eventTime) is unique in
    // the corpus, so min_by/max_by open/close picks are tie-free and the
    // streaming/batch comparison is exact by construction
    val ticksDf = Tables.ticks(spark, sfDir).select(
      col("symbol"),
      timestamp_micros(expr("ts div 1000")).as("eventTime"),
      col("price"),
      col("volume"))
    val feed = ticksDf.as[Tick].collect().sortBy(_.eventTime.getTime)
    val horizon = new java.sql.Timestamp(feed.last.eventTime.getTime + 7 * 86400 * 1000L)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = candles(input.toDF(), "1 hour", "30 seconds")
      .writeStream.format("memory").queryName("bars_scale").outputMode("append").start()
    try {
      feed.grouped(10000).foreach { chunk =>
        input.addData(chunk.toSeq)
        query.processAllAvailable() // watermark advances between chunks
      }
      // push the watermark past every real window so the last bars close
      input.addData(Tick("__SENTINEL__", horizon, java.math.BigDecimal.ONE, 0L))
      query.processAllAvailable()

      val streamed = spark.table("bars_scale")
        .where(col("symbol") =!= "__SENTINEL__")
        .orderBy("symbol", "bucket_ts").collect().toSeq
      val batch = candles(ticksDf, "1 hour")
        .orderBy("symbol", "bucket_ts").collect().toSeq
      assert(streamed.size == batch.size,
        s"streaming closed ${streamed.size} bars, batch computed ${batch.size}")
      assert(streamed == batch, "append-mode bars diverged from the batch aggregation")
      assert(streamed.size > 1000, s"expected thousands of (symbol, hour) bars, got ${streamed.size}")
    } finally query.stop()
  }
}
