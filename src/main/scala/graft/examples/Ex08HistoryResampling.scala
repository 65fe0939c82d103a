package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Interval negotiation + weekly resample (reference:
  * borsa/examples/08_history_resampling.rs — request daily data, get
  * Monday-anchored weekly candles).
  *
  * The provider only serves D1; the request asks for W1. The router's
  * interval negotiation (R6) fetches daily and resamples to weekly (R3):
  * every output ts is a Monday 00:00 UTC, open = first trading day's open,
  * close = last trading day's close, volume = week's sum.
  */
object Ex08HistoryResampling extends Example {
  val name = "08 history resampling (D1 -> W1)"

  def run(spark: SparkSession): Seq[String] = {
    val daily = new MockConnector("daily",
      MockConnector.Script(supportedIntervals = Seq(Interval.D1)))
    val g = new Graft(spark, Seq(daily))
    val tsla = Instrument(Symbol("TSLA"), None, AssetKind.Equity)

    val start = 1704067200L // Mon 2024-01-01
    val req = HistoryRequest(Interval.W1, Some(start), Some(start + 28 * 86400), None)
    g.history(tsla, req) match {
      case Right(h) =>
        val rows = h.candles.orderBy("ts")
          .select("ts", "open", "high", "low", "close", "volume").collect()
        Seq(s"weekly candles: ${rows.length}",
          f"${"week start (Mon)"}%-18s| open    | high    | low     | close   | volume") ++
          rows.map { r =>
            val mondayCheck = if (((r.getLong(0) / 86400) + 3) % 7 == 0) "" else "  << NOT A MONDAY"
            f"${r.getLong(0)}%-18d| ${r.getDecimal(1)}%-8s| ${r.getDecimal(2)}%-8s| ${r.getDecimal(3)}%-8s| ${r.getDecimal(4)}%-8s| ${r.getLong(5)}%d$mondayCheck"
          }
      case Left(e) => Seq(s"history failed: $e")
    }
  }
}
