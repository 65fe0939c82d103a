package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Analyst recommendations + summary + price target (reference:
  * borsa/examples/10_analyst_recommendations.rs and 04_price_target.rs —
  * three typed capability calls through the same router).
  */
object Ex10Recommendations extends Example {
  val name = "10 analyst recommendations + price target"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    (for {
      recs <- g.recommendations(aapl)
      summary <- g.recommendationsSummary(aapl)
      target <- g.priceTarget(aapl)
    } yield {
      recs.map(r =>
        s"${r.period}: strongBuy=${r.strongBuy} buy=${r.buy} hold=${r.hold} sell=${r.sell}") ++
        Seq(
          s"summary: mean=${summary.mean.getOrElse("?")} (${summary.key.getOrElse("?")})",
          s"price target: low=${target.low.getOrElse("?")} mean=${target.mean.getOrElse("?")} high=${target.high.getOrElse("?")}")
    }).fold(e => Seq(s"analysis failed: $e"), identity)
  }
}
