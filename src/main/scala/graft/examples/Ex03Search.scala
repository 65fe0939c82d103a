package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.{MockConnector, SearchResult}
import graft.core.Model._
import graft.routing.Policy

/** Multi-provider search with dedup and limit (reference:
  * borsa/examples/03_search.rs). Two providers answer the same query; the
  * router fans out, merges, dedups by symbol with the exchange-preference
  * rule (S2), and applies the limit. The preferred exchange's row survives
  * the dedup.
  */
object Ex03Search extends Example {
  val name = "03 search fan-out + dedup"

  def run(spark: SparkSession): Seq[String] = {
    // both providers know "ZZ1" — alpha lists it on PINK, beta on NMS;
    // with NMS preferred, beta's listing wins the dedup
    val alpha = new MockConnector("alpha", MockConnector.Script(
      searchResults = Map("ZZ" -> Seq(
        SearchResult("ZZ1", Some("ZZ One Corp"), Some("PINK"), Some(AssetKind.Equity)),
        SearchResult("ZZ2", Some("ZZ Two Corp"), Some("PINK"), Some(AssetKind.Equity))))))
    val beta = new MockConnector("beta", MockConnector.Script(
      searchResults = Map("ZZ" -> Seq(
        SearchResult("ZZ1", Some("ZZ One Corp"), Some("NMS"), Some(AssetKind.Equity)),
        SearchResult("ZZ3", Some("ZZ Three Corp"), Some("NMS"), Some(AssetKind.Equity))))))
    val g = new Graft(spark, Seq(alpha, beta),
      Policy.ProviderPolicy().withGlobal(Seq("alpha", "beta")),
      exchangePrefs = Policy.ExchangePreference(global = Seq(Exchange("NMS"), Exchange("PINK"))))

    g.search("ZZ", limit = Some(10)) match {
      case Right(report) =>
        Seq(s"results: ${report.payload.size} (warnings: ${report.warnings.size})") ++
          report.payload.map(r =>
            s" - ${r.symbol}  ${r.name.getOrElse("?")}  [${r.exchange.getOrElse("?")}]")
      case Left(e) => Seq(s"search failed: $e")
    }
  }
}
