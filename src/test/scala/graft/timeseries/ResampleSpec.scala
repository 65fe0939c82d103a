package graft.timeseries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Ports of the reference resample properties
  * (borsa-core/tests/resample_props.rs:20-297).
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val candleSchema = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ts", LongType),
    StructField("open", DecimalType(18, 6)),
    StructField("high", DecimalType(18, 6)),
    StructField("low", DecimalType(18, 6)),
    StructField("close", DecimalType(18, 6)),
    StructField("volume", LongType)))

  test("UTC equivalence: tz-aware bucketing under a UTC meta equals plain UTC bucketing (resample_props.rs:282)") {
    (1 to 5).foreach { seed =>
      val r = new scala.util.Random(seed)
      val ticks = (0 until 40).map { _ =>
        val secs = 3600L * r.nextInt(24 * 21) + 60L * r.nextInt(60)
        (s"S${r.nextInt(2)}", secs, secs, BigDecimal(1 + r.nextInt(100)), 5L)
      }.toDF("symbol", "ts", "secs", "price", "volume")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(canon(Resample.toDailyLocal(ticks, "UTC")) == canon(Resample.toDaily(ticks)),
        s"seed=$seed daily")
      assert(canon(Resample.toWeeklyLocal(ticks, "UTC")) == canon(Resample.toWeekly(ticks)),
        s"seed=$seed weekly")
      assert(canon(Resample.toMinutesLocal(ticks, "UTC", 15)) == canon(Resample.toMinutes(ticks, 15)),
        s"seed=$seed minutes")
      // offset-0 form agrees too (the third branch of bucketFor)
      assert(canon(Resample.toDailyOffset(ticks, 0L)) == canon(Resample.toDaily(ticks)),
        s"seed=$seed offset0")
    }
  }

  /** Coherent-OHLC candle generator (resample_props.rs:20-58): low <= open,
    * close <= high.
    */
  private def candles(n: Int, stepSecs: Long, seed: Long): Seq[Row] =
    (0 until n).map { i =>
      val r = new scala.util.Random(seed + i)
      val base = BigDecimal(100 + r.nextInt(50))
      val o = base + BigDecimal(r.nextInt(10))
      val c = base + BigDecimal(r.nextInt(10))
      val h = o.max(c) + 1
      val l = o.min(c) - 1
      Row("S", 1704067200L + i * stepSecs,
        o.bigDecimal, h.bigDecimal, l.bigDecimal, c.bigDecimal, 100L + i)
    }

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), candleSchema)

  test("ohlc rules: open=earliest, close=latest, high=max, low=min, volume=sum (daily)") {
    val in = df(candles(48, 3600, 1))
    val out = Resample.resampleCandles(in, Resample.dailyBucket(col("ts")))
      .orderBy("bucket_ts").collect()
    assert(out.length == 2) // 48 hourly candles = 2 days
    val day0 = in.filter(col("ts") < 1704067200L + 86400).orderBy("ts").collect()
    val first = out(0)
    assert(first.getAs[java.math.BigDecimal]("open") == day0.head.getAs[java.math.BigDecimal]("open"))
    assert(first.getAs[java.math.BigDecimal]("close") == day0.last.getAs[java.math.BigDecimal]("close"))
    assert(first.getAs[java.math.BigDecimal]("high") ==
      day0.map(_.getAs[java.math.BigDecimal]("high")).max)
    assert(first.getAs[java.math.BigDecimal]("low") ==
      day0.map(_.getAs[java.math.BigDecimal]("low")).min)
    assert(first.getAs[Long]("volume") == day0.map(_.getAs[Long]("volume")).sum)
  }

  test("resample idempotent: daily of daily is identity (resample_props.rs:66)") {
    val in = df(candles(10, 86400, 2))
    val once = Resample.resampleCandles(in, Resample.dailyBucket(col("ts")))
      .withColumnRenamed("bucket_ts", "ts").drop("close_unadj")
    val twice = Resample.resampleCandles(once, Resample.dailyBucket(col("ts")))
      .withColumnRenamed("bucket_ts", "ts").drop("close_unadj")
    assert(once.orderBy("ts").collect().toSeq == twice.orderBy("ts").collect().toSeq)
  }

  test("weekly buckets are Monday-anchored (resample.rs:11-19)") {
    // 2024-01-01 is a Monday, epoch day 19723
    val mondayTs = 1704067200L
    val out = Resample.resampleCandles(
      df(candles(14, 86400, 3)), Resample.weeklyBucket(col("ts")))
      .orderBy("bucket_ts").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("bucket_ts") == mondayTs)
    assert(out(1).getAs[Long]("bucket_ts") == mondayTs + 7 * 86400)
    // anchor property: bucket start is always a Monday (day mod 7 == 4 since day 0 = Thursday)
    out.foreach(r => assert(((r.getAs[Long]("bucket_ts") / 86400) + 3) % 7 == 0))
  }

  test("minutes guardrail: minutes <= 0 returns input unchanged (resample.rs:452-456)") {
    val ticks = Seq(("S", 1704067200L, BigDecimal(1), 1L)).toDF("symbol", "secs", "price", "volume")
      .withColumn("ts", col("secs"))
    assert(Resample.toMinutes(ticks, 0).collect().toSeq == ticks.collect().toSeq)
    assert(Resample.toMinutes(ticks, -5).collect().toSeq == ticks.collect().toSeq)
  }

  test("offset-aware daily bucketing shifts local midnight (resample.rs:279-302)") {
    // 23:00 UTC with +2h offset lands in the NEXT local day
    val rows = Seq(Row("S", 1704150000L, // 2024-01-01 23:00 UTC
      BigDecimal(1).bigDecimal, BigDecimal(2).bigDecimal,
      BigDecimal(0).bigDecimal, BigDecimal(1).bigDecimal, 1L))
    val utc = Resample.resampleCandles(df(rows), Resample.dailyBucket(col("ts"))).collect()(0)
    assert(utc.getAs[Long]("bucket_ts") == 1704067200L) // 2024-01-01 00:00 UTC
    val off = 2 * 3600L
    val local = Resample.resampleCandles(df(rows),
      Resample.dailyBucket(col("ts") + off) - off).collect()(0)
    assert(local.getAs[Long]("bucket_ts") == 1704153600L - off) // 2024-01-02 00:00 local, back in UTC
  }

  test("volume saturates at Long.MaxValue (resample.rs:82-84)") {
    val rows = Seq(
      Row("S", 1704067200L, BigDecimal(1).bigDecimal, BigDecimal(2).bigDecimal,
        BigDecimal(0).bigDecimal, BigDecimal(1).bigDecimal, Long.MaxValue),
      Row("S", 1704067260L, BigDecimal(1).bigDecimal, BigDecimal(2).bigDecimal,
        BigDecimal(0).bigDecimal, BigDecimal(1).bigDecimal, 5L))
    val out = Resample.resampleCandles(df(rows), Resample.dailyBucket(col("ts"))).collect()(0)
    assert(out.getAs[Long]("volume") == Long.MaxValue)
  }
}
