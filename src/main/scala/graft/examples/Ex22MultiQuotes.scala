package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Batch quotes with partial success (reference:
  * borsa/examples/22_multi_quotes.rs — one call, many symbols; failures
  * are reported per symbol, the rest succeed: Q1 semantics).
  */
object Ex22MultiQuotes extends Example {
  val name = "22 multi quotes (partial success)"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val instruments = Seq("AAPL", "MSFT", "FAIL", "GOOG")
      .map(s => Instrument(Symbol(s), None, AssetKind.Equity))
    val (quotes, errors) = g.quotes(instruments)
    quotes.map(q => f"  ${q.symbol}%-6s $$${q.price.getOrElse(BigDecimal(0))}%.2f") ++
      Seq(s"failed symbols: ${errors.keys.toSeq.sorted.mkString(", ")}")
  }
}
