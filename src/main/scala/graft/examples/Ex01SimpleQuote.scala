package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** A single quote through the router (reference:
  * borsa/examples/01_simple_quote.rs) — build the engine with one
  * connector, fetch a quote, read price / previous close off the typed
  * payload.
  */
object Ex01SimpleQuote extends Example {
  val name = "01 simple quote"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    g.quote(aapl) match {
      case Right(q) =>
        Seq(
          s"symbol:         ${q.symbol}",
          s"price:          ${q.price.map(p => f"$$$p%.2f").getOrElse("n/a")} ${q.currency.getOrElse("")}",
          s"previous close: ${q.previousClose.map(p => f"$$$p%.2f").getOrElse("n/a")}",
          s"market state:   ${q.marketState.getOrElse("n/a")}")
      case Left(e) => Seq(s"quote failed: $e")
    }
  }
}
