package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.router.HistoryOrchestrator
import graft.routing.Policy

/** Deep vs Fallback merge strategies (reference:
  * borsa/examples/14_merge_strategies.rs):
  *
  *  - DEEP (default) fans out to every eligible provider and backfills
  *    gaps: the short preferred feed contributes its head, the full feed
  *    fills the tail — more coverage, more provider calls;
  *  - FALLBACK takes the FIRST non-empty result and stops: fewer calls,
  *    only the preferred provider's coverage.
  *
  * Same providers, same request — the candle count and attribution tell
  * the two strategies apart.
  */
object Ex14MergeStrategies extends Example {
  val name = "14 merge strategies (Deep vs Fallback)"

  def run(spark: SparkSession): Seq[String] = {
    def providers() = Seq(
      new MockConnector("short", MockConnector.Script(maxCandles = 3)),
      new MockConnector("full"))
    val policy = Policy.ProviderPolicy().withGlobal(Seq("short", "full"))
    val goog = Instrument(Symbol("GOOG"), None, AssetKind.Equity)
    val start = 1704067200L
    val req = HistoryRequest(Interval.D1, Some(start), Some(start + 10 * 86400), None)

    def describe(label: String, strategy: HistoryOrchestrator.MergeStrategy): Seq[String] = {
      val g = new Graft(spark, providers(), policy,
        historyConfig = HistoryOrchestrator.Config(strategy = strategy))
      g.history(goog, req) match {
        case Right(h) =>
          val n = h.candles.count()
          val provs = h.attribution.select("provider").distinct()
            .collect().map(_.getString(0)).sorted
          Seq(s"$label: $n candles from ${provs.mkString(" + ")}")
        case Left(e) => Seq(s"$label failed: $e")
      }
    }
    describe("Deep    ", HistoryOrchestrator.MergeStrategy.Deep) ++
      describe("Fallback", HistoryOrchestrator.MergeStrategy.Fallback)
  }
}
