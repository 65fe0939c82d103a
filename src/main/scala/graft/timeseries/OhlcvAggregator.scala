package graft.timeseries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fused single-pass OHLCV aggregator (SURVEY §4: the reference's
  * hand-fused sort-agg, resample.rs:26-121, as ONE accumulator instead of
  * five separate aggregate buffers).
  *
  * `Aggregator[TickIn, OhlcvBuf, OhlcvOut]` for the typed Dataset API:
  * one buffer per (symbol, bucket) holding (tsOfOpen, open, high, low,
  * tsOfClose, close, volSum, volSeen). merge() is commutative/associative
  * (earliest-ts open wins, latest-ts close wins), so partial aggregation
  * and shuffle-order nondeterminism cannot change the result — required
  * for 100 TB determinism. Volume saturates at Long.MaxValue
  * (resample.rs:82-84).
  */
object OhlcvAggregator {

  final case class TickIn(ts: Long, price: BigDecimal, volume: Option[Long])
  final case class OhlcvBuf(
      openTs: Long, open: BigDecimal,
      high: BigDecimal, low: BigDecimal,
      closeTs: Long, close: BigDecimal,
      volume: Long, hasVolume: Boolean, empty: Boolean)
  final case class OhlcvOut(
      open: BigDecimal, high: BigDecimal, low: BigDecimal, close: BigDecimal,
      volume: Option[Long])

  val instance: Aggregator[TickIn, OhlcvBuf, OhlcvOut] =
    new Aggregator[TickIn, OhlcvBuf, OhlcvOut] {
      def zero: OhlcvBuf =
        OhlcvBuf(Long.MaxValue, null, null, null, Long.MinValue, null, 0L, false, empty = true)

      private def satAdd(a: Long, b: Long): Long = {
        val s = a + b
        if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s // overflow → saturate
      }

      def reduce(b: OhlcvBuf, t: TickIn): OhlcvBuf = {
        val openTs = if (t.ts < b.openTs) t.ts else b.openTs
        val open = if (t.ts < b.openTs) t.price else b.open
        val closeTs = if (t.ts > b.closeTs) t.ts else b.closeTs
        val close = if (t.ts > b.closeTs) t.price else b.close
        val high = if (b.empty || t.price > b.high) t.price else b.high
        val low = if (b.empty || t.price < b.low) t.price else b.low
        val vol = t.volume.map(v => satAdd(b.volume, v)).getOrElse(b.volume)
        OhlcvBuf(openTs, open, high, low, closeTs, close,
          vol, b.hasVolume || t.volume.isDefined, empty = false)
      }

      def merge(a: OhlcvBuf, b: OhlcvBuf): OhlcvBuf =
        if (a.empty) b
        else if (b.empty) a
        else OhlcvBuf(
          if (a.openTs <= b.openTs) a.openTs else b.openTs,
          if (a.openTs <= b.openTs) a.open else b.open,
          if (a.high >= b.high) a.high else b.high,
          if (a.low <= b.low) a.low else b.low,
          if (a.closeTs >= b.closeTs) a.closeTs else b.closeTs,
          if (a.closeTs >= b.closeTs) a.close else b.close,
          satAdd(a.volume, b.volume),
          a.hasVolume || b.hasVolume,
          empty = false)

      def finish(b: OhlcvBuf): OhlcvOut =
        OhlcvOut(b.open, b.high, b.low, b.close,
          if (b.hasVolume) Some(b.volume) else None) // all-NULL volume → NULL

      def bufferEncoder: Encoder[OhlcvBuf] = Encoders.product[OhlcvBuf]
      def outputEncoder: Encoder[OhlcvOut] = Encoders.product[OhlcvOut]
    }
}
