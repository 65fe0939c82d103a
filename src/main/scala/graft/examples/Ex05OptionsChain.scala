package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Option expirations + chain (reference: borsa/examples/05_options_chain.rs
  * — list expirations, fetch the chain for the nearest one, show calls and
  * puts around the money).
  */
object Ex05OptionsChain extends Example {
  val name = "05 options chain"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    (for {
      exps <- g.optionsExpirations(aapl)
      chain <- g.optionChain(aapl, exps.headOption)
    } yield {
      Seq(s"expirations: ${exps.mkString(", ")}",
        s"chain @ ${exps.head}: ${chain.calls.size} calls / ${chain.puts.size} puts") ++
        chain.calls.map(c =>
          f" C strike ${c.strike}%-8s last ${c.lastPrice.getOrElse(BigDecimal(0))}%-6s oi ${c.openInterest.getOrElse(0L)}")
    }).fold(e => Seq(s"options failed: $e"), identity)
  }
}
