package graft.routing

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._
import graft.routing.Policy._

/** Table-driven tests mirroring router_policy_tiebreak.rs /
  * routing_policy_serde.rs (reference borsa-types/src/routing_policy.rs).
  */
class PolicySpec extends AnyFunSuite {
  private val sym = Symbol("AAPL")
  private val ctx = Context(Some(sym), Some(AssetKind.Equity), Some(Exchange("NYSE")))

  test("specificity: more selector fields beats fewer") {
    val p = ProviderPolicy()
      .withRule(Selector(kind = Some(AssetKind.Equity)), Seq("broad"))
      .withRule(Selector(symbol = Some(sym), kind = Some(AssetKind.Equity)), Seq("narrow"))
    assert(p.bestRule(ctx).get.providers == Seq("narrow"))
  }

  test("specificity tie-break: symbol > kind > exchange bits") {
    val p = ProviderPolicy()
      .withRule(Selector(kind = Some(AssetKind.Equity), exchange = Some(Exchange("NYSE"))), Seq("ke"))
      .withRule(Selector(symbol = Some(sym), exchange = Some(Exchange("NYSE"))), Seq("se"))
    // both 2 bits; (1,0,1) > (0,1,1) because symbol bit outranks
    assert(p.bestRule(ctx).get.providers == Seq("se"))
  }

  test("equal specificity: last-defined rule wins (routing_policy.rs:464-495)") {
    val p = ProviderPolicy()
      .withRule(Selector(symbol = Some(sym)), Seq("first"))
      .withRule(Selector(symbol = Some(sym)), Seq("second"))
    assert(p.bestRule(ctx).get.providers == Seq("second"))
  }

  test("strict rule excludes unlisted providers; non-strict ranks them last") {
    val strict = ProviderPolicy().withRule(Selector(symbol = Some(sym)), Seq("a"), strict = true)
    assert(strict.providerRank(ctx, "a") == Some((0L, true)))
    assert(strict.providerRank(ctx, "b") == None)
    val loose = ProviderPolicy().withRule(Selector(symbol = Some(sym)), Seq("a"))
    assert(loose.providerRank(ctx, "b") == Some((UnlistedRank, false)))
  }

  test("fallthrough: no matching rule -> global -> default eligible") {
    val p = ProviderPolicy()
      .withRule(Selector(symbol = Some(Symbol("OTHER"))), Seq("x"), strict = true)
      .withGlobal(Seq("g1", "g2"))
    assert(p.providerRank(ctx, "g2") == Some((1L, false)))
    val empty = ProviderPolicy()
    assert(empty.providerRank(ctx, "anything") == Some((UnlistedRank, false)))
  }

  test("orderedForContext: stable sort by (rank, registration index) (core.rs:407-434)") {
    val p = ProviderPolicy().withRule(Selector(symbol = Some(sym)), Seq("c", "a"))
    // ranks: c=0, a=1, b=unlisted; registration order a,b,c
    assert(p.orderedForContext(ctx, Seq("a", "b", "c")) == Seq("c", "a", "b"))
    // strict excludes b entirely
    val ps = ProviderPolicy().withRule(Selector(symbol = Some(sym)), Seq("c", "a"), strict = true)
    assert(ps.orderedForContext(ctx, Seq("a", "b", "c")) == Seq("c", "a"))
  }

  test("exchange preference scope: symbol > kind > global (routing_policy.rs:210-247)") {
    val prefs = ExchangePreference(
      bySymbol = Map(sym -> Seq(Exchange("LSE"))),
      byKind = Map[AssetKind, Seq[Exchange]](AssetKind.Equity -> Seq(Exchange("NYSE"))),
      global = Seq(Exchange("XETRA")))
    assert(prefs.resolve(Some(sym), Some(AssetKind.Equity)) == Seq(Exchange("LSE")))
    assert(prefs.resolve(Some(Symbol("Z")), Some(AssetKind.Equity)) == Seq(Exchange("NYSE")))
    assert(prefs.resolve(Some(Symbol("Z")), Some(AssetKind.Crypto)) == Seq(Exchange("XETRA")))
  }
}
