package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming OHLCV candle construction from a tick stream — the
  * `stream-candles` capability (reference CandleUpdate contract:
  * borsa-core/src/connector.rs:270-288 — intermediate bar updates carry
  * is_final=false; the bar closes with is_final=true).
  *
  * Spark-first: `readStream → withWatermark → groupBy(window, symbol) →
  * OHLCV agg`. Two output modes map to the reference contract:
  *  - Append mode emits each bar ONCE when the watermark passes its end
  *    (is_final=true only) — the exactly-once closed-bar feed;
  *  - Update mode re-emits bars as ticks arrive (is_final=false updates),
  *    final value when the watermark closes the window.
  *
  * The aggregation itself is the SAME R1 shape as the batch kernel
  * (min_by/max_by by event time, sum volume) so a batch replay over the
  * same ticks produces identical bars — property-tested in
  * CandleAggregatorSpec.
  */
object CandleAggregator {

  final case class Tick(symbol: String, eventTime: java.sql.Timestamp, price: java.math.BigDecimal, volume: Long)

  /** Windowed OHLCV over a (possibly streaming) tick frame with columns
    * (symbol, eventTime TIMESTAMP, price DECIMAL, volume LONG).
    * `lateness` bounds out-of-order arrival (watermark).
    */
  def candles(
      ticks: DataFrame,
      windowLength: String = "1 minute",
      lateness: String = "30 seconds"): DataFrame = {
    val withWm =
      if (ticks.isStreaming) ticks.withWatermark("eventTime", lateness) else ticks
    withWm
      .groupBy(col("symbol"), window(col("eventTime"), windowLength).as("w"))
      .agg(
        min_by(col("price"), col("eventTime")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("eventTime")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(
        col("symbol"),
        col("w.start").cast("long").as("bucket_ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume"), col("n_ticks"))
  }

  /** The CandleUpdate `is_final` contract (connector.rs:270-288) as two
    * feeds over ONE aggregation shape:
    *
    *  - [[updates]] runs with `outputMode("update")`: every re-emission of
    *    a still-open bar is an intermediate update, is_final=false;
    *  - [[finals]] runs with `outputMode("append")`: a bar is emitted
    *    exactly once, when the watermark closes its window — is_final=true.
    *
    * Their union downstream is the reference's bar stream: zero or more
    * false updates per bucket followed by exactly one true close. Keeping
    * them as two queries (rather than one stream guessing finality) is the
    * Spark-native mapping — finality IS append-mode semantics.
    */
  def updates(
      ticks: DataFrame,
      windowLength: String = "1 minute",
      lateness: String = "30 seconds"): DataFrame =
    candles(ticks, windowLength, lateness).withColumn("is_final", lit(false))

  def finals(
      ticks: DataFrame,
      windowLength: String = "1 minute",
      lateness: String = "30 seconds"): DataFrame =
    candles(ticks, windowLength, lateness).withColumn("is_final", lit(true))
}
