package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.routing.Policy

/** Per-symbol routing override (reference:
  * borsa/examples/12_per_symbol_priority.rs — a fast-but-inaccurate and a
  * slow-but-accurate connector; normal symbols go to fast, SPECIAL has a
  * per-symbol rule flipping the priority).
  *
  * The serving connector is visible through the exchange it stamps on the
  * quote (FAST-VENUE vs ACCURATE-VENUE).
  */
object Ex12PerSymbolPriority extends Example {
  val name = "12 per-symbol priority override"

  def run(spark: SparkSession): Seq[String] = {
    def venue(code: String) = MockConnector.Script(
      exchanges = Map("NORMAL" -> code, "SPECIAL" -> code))
    val fast = new MockConnector("fast-but-inaccurate", venue("FAST-VENUE"))
    val accurate = new MockConnector("slow-but-accurate", venue("ACCURATE-VENUE"))

    val policy = Policy.ProviderPolicy()
      .withRule(Policy.Selector(kind = Some(AssetKind.Equity)),
        Seq("fast-but-inaccurate", "slow-but-accurate"))
      .withRule(Policy.Selector(symbol = Some(Symbol("SPECIAL"))),
        Seq("slow-but-accurate", "fast-but-inaccurate"))
    val g = new Graft(spark, Seq(fast, accurate), policy)

    def served(sym: String): String =
      g.quote(Instrument(Symbol(sym), None, AssetKind.Equity)) match {
        case Right(q) => s"'$sym' served from ${q.exchange.getOrElse("?")}"
        case Left(e)  => s"'$sym' failed: $e"
      }
    Seq(
      served("NORMAL"), // kind rule: fast wins
      served("SPECIAL")) // symbol rule is more specific: accurate wins
  }
}
