package graft.routing

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.router.{Fetch, HistoryOrchestrator, HistoryRouter}
import graft.routing.PolicySerde._

/** Round-trip + tolerance tests for the config serde surface (the
  * reference's borsa-types serde test pattern).
  */
class PolicySerdeSpec extends AnyFunSuite {

  private val full = GraftConfig(
    routing = Policy.ProviderPolicy()
      .withRule(Policy.Selector(symbol = Some(Symbol("AAPL")), kind = Some(AssetKind.Equity)),
        Seq("alpha", "beta"), strict = true)
      .withRule(Policy.Selector(exchange = Some(Exchange("NMS"))), Seq("beta"))
      .withGlobal(Seq("alpha"), strict = false),
    exchangePreferences = Policy.ExchangePreference(
      bySymbol = Map(Symbol("AAPL") -> Seq(Exchange("NMS"), Exchange("LSE"))),
      byKind = Map(AssetKind.Crypto -> Seq(Exchange("BINANCE"))),
      global = Seq(Exchange("NMS"))),
    fetch = Fetch.Config(Fetch.Strategy.Latency, providerTimeout = 2.seconds,
      requestTimeout = Some(9.seconds)),
    history = HistoryOrchestrator.Config(
      strategy = HistoryOrchestrator.MergeStrategy.Fallback,
      preferAdjusted = false,
      providerTimeout = 3.seconds,
      finalResample = HistoryRouter.FinalResample.AutoDaily,
      requestTimeout = Some(30.seconds)),
    middleware = graft.Graft.MiddlewareConfig(
      cache = None, // explicitly disabled layer
      blacklist = Some(graft.connector.Middleware.BlacklistConfig(defaultWindowMs = 1234L)),
      quota = Some(graft.connector.Middleware.QuotaConfig(limit = 7, windowMs = 1000L,
        strategy = graft.connector.Middleware.QuotaStrategy.Weighted,
        capabilityWeights = Map("history" -> 5L, "quote" -> 1L)))))

  test("toJson → fromJson round-trips the full config") {
    val Right(back) = fromJson(toJson(full))
    assert(back == full)
  }

  test("round-tripped policy answers rank queries identically") {
    val Right(back) = fromJson(toJson(full))
    val ctxs = Seq(
      Policy.Context(Some(Symbol("AAPL")), Some(AssetKind.Equity), None),
      Policy.Context(Some(Symbol("MSFT")), Some(AssetKind.Equity), Some(Exchange("NMS"))),
      Policy.Context(None, Some(AssetKind.Crypto), None))
    for (ctx <- ctxs; p <- Seq("alpha", "beta", "gamma"))
      assert(back.routing.providerRank(ctx, p) == full.routing.providerRank(ctx, p),
        s"rank divergence for $ctx / $p")
  }

  test("defaults: an empty object parses to the default config") {
    val Right(cfg) = fromJson("{}")
    assert(cfg == GraftConfig())
  }

  test("unknown fields are ignored (forward compatibility)") {
    val Right(cfg) = fromJson(
      """{"routing": {"rules": [], "futureKnob": 1}, "somethingNew": {"a": 2}}""")
    assert(cfg.routing == Policy.ProviderPolicy())
  }

  test("middleware layers: absent=defaults, null=disabled, object=configured") {
    val Right(defaults) = fromJson("{}")
    assert(defaults.middleware == graft.Graft.MiddlewareConfig())
    val Right(disabled) = fromJson("""{"middleware": {"cache": null, "quota": null}}""")
    assert(disabled.middleware.cache.isEmpty && disabled.middleware.quota.isEmpty)
    assert(disabled.middleware.blacklist.nonEmpty) // absent → default-enabled
    assert(fromJson("""{"middleware": {"quota": {"strategy": "psychic"}}}""")
      .left.exists(_.isInstanceOf[BorsaError.InvalidArg]))
  }

  test("unknown enum values are InvalidArg, malformed JSON is InvalidArg") {
    assert(fromJson("""{"fetch": {"strategy": "psychic"}}""")
      .left.exists(_.isInstanceOf[BorsaError.InvalidArg]))
    assert(fromJson("""{"history": {"finalResample": "hourly"}}""")
      .left.exists(_.isInstanceOf[BorsaError.InvalidArg]))
    assert(fromJson("""{"routing": {"rules": [{"kind": "meme"}]}}""")
      .left.exists(_.isInstanceOf[BorsaError.InvalidArg]))
    assert(fromJson("""{"not json""").left.exists(_.isInstanceOf[BorsaError.InvalidArg]))
  }
}
