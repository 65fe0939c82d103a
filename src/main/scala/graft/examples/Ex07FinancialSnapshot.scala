package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Composed financial snapshot (reference:
  * borsa/examples/07_financial_snapshot.rs, folding in the capability
  * calls of 06_fundamentals_deep_dive.rs, 19_news.rs and 20_esg.rs):
  * earnings history, the three statements, ESG scores and headlines for
  * one instrument, all through the same typed capability router.
  */
object Ex07FinancialSnapshot extends Example {
  val name = "07 financial snapshot (fundamentals + esg + news)"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    (for {
      earnings <- g.earnings(aapl)
      income <- g.incomeStatement(aapl)
      balance <- g.balanceSheet(aapl, quarterly = true)
      cash <- g.cashflow(aapl)
      esg <- g.esg(aapl)
      news <- g.news(aapl, graft.core.Payloads.NewsRequest(limit = 2))
    } yield {
      earnings.yearly.map(y =>
        s"FY${y.year}: revenue=${y.revenue.getOrElse("?")} earnings=${y.earnings.getOrElse("?")}") ++
        Seq(
          s"income rows:   ${income.map(r => s"${r.item}=${r.value.getOrElse("?")}").mkString(", ")}",
          s"balance (Q):   ${balance.map(_.period).distinct.mkString(", ")}",
          s"cashflow rows: ${cash.size}",
          s"esg: E=${esg.environmental.getOrElse("?")} S=${esg.social.getOrElse("?")} G=${esg.governance.getOrElse("?")}") ++
        news.map(n => s"news: ${n.title} (${n.publisher.getOrElse("?")})")
    }).fold(e => Seq(s"snapshot failed: $e"), identity)
  }
}
