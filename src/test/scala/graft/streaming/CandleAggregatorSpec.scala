package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.CandleAggregator._

class CandleAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def tick(sym: String, secs: Long, price: String, vol: Long) =
    Tick(sym, new Timestamp(secs * 1000), new java.math.BigDecimal(price), vol)

  private val ticks = Seq(
    tick("S", 60, "10.0", 1), tick("S", 70, "12.5", 2), tick("S", 110, "9.0", 3), // window [60,120)
    tick("S", 125, "11.0", 4), // window [120,180)
    tick("T", 65, "5.0", 7))

  test("streaming append-mode candles equal the batch aggregation of the same ticks") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = candles(input.toDF(), "1 minute", "30 seconds")
      .writeStream.format("memory").queryName("candles_out").outputMode("append").start()
    try {
      input.addData(ticks)
      query.processAllAvailable()
      // push the watermark far past all windows so every bar closes
      input.addData(tick("S", 100000, "1.0", 0))
      query.processAllAvailable()
      val streamed = spark.table("candles_out")
        .where(col("bucket_ts") < 100000)
        .orderBy("symbol", "bucket_ts").collect().toSeq
      val batch = candles(ticks.toDF(), "1 minute")
        .orderBy("symbol", "bucket_ts").collect().toSeq
      assert(streamed == batch)
      // spot-check a bar: S window [60,120): open 10.0 (ts60), close 9.0 (ts110)
      val s0 = streamed.head
      assert(s0.getAs[Long]("bucket_ts") == 60L)
      assert(s0.getAs[java.math.BigDecimal]("open").doubleValue() == 10.0)
      assert(s0.getAs[java.math.BigDecimal]("close").doubleValue() == 9.0)
      assert(s0.getAs[java.math.BigDecimal]("high").doubleValue() == 12.5)
      assert(s0.getAs[Long]("volume") == 6L)
    } finally query.stop()
  }

  test("late tick beyond the watermark is dropped from closed bars") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = candles(input.toDF(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("candles_late").outputMode("append").start()
    try {
      input.addData(Seq(tick("S", 60, "10.0", 1)))
      query.processAllAvailable()
      input.addData(Seq(tick("S", 1000, "99.0", 1))) // advances watermark to 990 → closes [60,120)
      query.processAllAvailable()
      input.addData(Seq(tick("S", 70, "50.0", 9))) // late: watermark long past
      query.processAllAvailable()
      val bar = spark.table("candles_late").where(col("bucket_ts") === 60).collect()
      assert(bar.length == 1)
      assert(bar(0).getAs[Long]("volume") == 1L) // the late tick did not reopen the bar
    } finally query.stop()
  }
}
