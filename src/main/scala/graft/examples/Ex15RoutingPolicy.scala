package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy

/** Exchange-scoped rules and STRICT routing (reference:
  * borsa/examples/15_routing_policy_exchange_and_strict.rs):
  *
  *  1. global default prefers `fast`;
  *  2. a NASDAQ exchange rule flips the order to `slow`;
  *  3. a STRICT crypto rule pins crypto to `slow` ONLY — when that provider
  *     is down the call FAILS rather than falling back (the point of
  *     strict: no silent data from an unvetted source);
  *  4. bonus, F6: an instrument PINNED to an exchange rejects a quote that
  *     reports a different venue, and the rejection continues the fallback
  *     chain.
  */
object Ex15RoutingPolicy extends Example {
  val name = "15 exchange rules + strict routing"

  def run(spark: SparkSession): Seq[String] = {
    val nasdaq = Exchange("NASDAQ")
    val policy = Policy.ProviderPolicy()
      .withGlobal(Seq("fast", "slow"))
      .withRule(Policy.Selector(exchange = Some(nasdaq)), Seq("slow", "fast"))
      .withRule(Policy.Selector(kind = Some(AssetKind.Crypto)), Seq("slow"), strict = true)

    // 1-3: the policy's provider order per context (what the router asks)
    val names = Seq("fast", "slow")
    def order(ctx: Policy.Context) = policy.orderedForContext(ctx, names).mkString(" -> ")
    val decisions = Seq(
      s"AAPL@NASDAQ equity: ${order(Policy.Context(Some(Symbol("AAPL")), Some(AssetKind.Equity), Some(nasdaq)))}",
      s"MSFT equity:        ${order(Policy.Context(Some(Symbol("MSFT")), Some(AssetKind.Equity), None))}",
      s"BTC-USD crypto:     ${order(Policy.Context(Some(Symbol("BTC-USD")), Some(AssetKind.Crypto), None))} (strict)")

    // 3 end-to-end: strict means NO fallback — with slow's quote feed down,
    // crypto fails even though fast could answer
    val slowDown = new MockConnector("slow", MockConnector.Script(
      behaviors = Map("quote" -> MockConnector.Fail(
        BorsaError.Connector("slow", BorsaError.Other("crypto feed down"))))))
    val g = new Graft(spark, Seq(new MockConnector("fast"), slowDown), policy)
    val strictFailure = g.quote(Instrument(Symbol("BTC-USD"), None, AssetKind.Crypto)) match {
      case Left(_)  => "BTC-USD with slow down: FAILS (strict: fast is never consulted)"
      case Right(_) => "BTC-USD unexpectedly served despite strict rule"
    }

    // 4: F6 exchange enforcement — lse-only provider answers, but the
    // instrument is pinned to NASDAQ, so the quote is demoted and the
    // chain moves on to the NASDAQ-stamping provider
    val lseOnly = new MockConnector("fast", MockConnector.Script(
      exchanges = Map("AAPL" -> "LSE")))
    val nasdaqProv = new MockConnector("slow", MockConnector.Script(
      exchanges = Map("AAPL" -> "NASDAQ")))
    val enforced = new Graft(spark, Seq(lseOnly, nasdaqProv),
        Policy.ProviderPolicy().withGlobal(Seq("fast", "slow")))
      .quote(Instrument(Symbol("AAPL"), Some(nasdaq), AssetKind.Equity)) match {
      case Right(q) => s"AAPL pinned to NASDAQ: LSE quote demoted, served from ${q.exchange.getOrElse("?")}"
      case Left(e)  => s"AAPL pinned to NASDAQ failed: $e"
    }

    decisions ++ Seq(strictFailure, enforced)
  }
}
