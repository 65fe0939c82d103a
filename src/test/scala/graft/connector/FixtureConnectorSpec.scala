package graft.connector

import org.scalatest.funsuite.AnyFunSuite

import graft.connector.FixtureConnector._
import graft.core.Errors.BorsaError
import graft.core.Model._

/** Injection tests over recorded wire payloads — the reference's
  * borsa-yfinance/tests/{quote,history,search,…}_injection.rs +
  * error_normalization.rs pattern: every case drives the REAL
  * parse/validate/normalize/error-map path, no model objects injected.
  */
class FixtureConnectorSpec extends AnyFunSuite {

  private val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
  private val reqD1 = HistoryRequest(Interval.D1, Some(0L), Some(10L * 86400), None)

  private def conn(fixtures: ((String, String), Either[HttpError, String])*) =
    new FixtureConnector("fix", new RecordedTransport(fixtures.toMap))

  // ------------------------------------------------------------- quote

  test("quote payload parses all fields (quote_injection.rs)") {
    val c = conn(("quote", "AAPL") -> Right(
      """{"symbol":"AAPL","price":"123.45","previousClose":"120.00","currency":"USD",
        |"shortname":"Apple Inc.","exchange":"NMS","marketState":"REGULAR","dayVolume":9876543}""".stripMargin))
    val Right(q) = c.quote(aapl)
    assert(q.symbol == "AAPL" && q.price.contains(BigDecimal("123.45")))
    assert(q.previousClose.contains(BigDecimal("120.00")) && q.currency.contains("USD"))
    assert(q.exchange.contains("NMS") && q.dayVolume.contains(9876543L))
  }

  test("quote with absent optional fields still parses; missing symbol is a data error") {
    val c = conn(
      ("quote", "AAPL") -> Right("""{"symbol":"AAPL"}"""),
      ("quote", "BARE") -> Right("""{"price":"1.0"}"""))
    assert(c.quote(aapl).exists(q => q.price.isEmpty && q.currency.isEmpty))
    c.quote(Instrument(Symbol("BARE"), None, AssetKind.Equity)) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("missing symbol"))
      case other => fail(s"expected Data error, got $other")
    }
  }

  test("unrecorded endpoint maps to NotFound (quote_not_found_maps.rs)") {
    conn().quote(aapl) match {
      case Left(BorsaError.NotFound(what)) => assert(what.contains("AAPL"))
      case other => fail(s"expected NotFound, got $other")
    }
  }

  test("HTTP 429 with retry-after maps to a tagged RateLimitExceeded carrying the window") {
    val c = conn(("quote", "AAPL") -> Left(HttpError(429, retryAfterMs = Some(5000L))))
    c.quote(aapl) match {
      case Left(BorsaError.Connector("fix", BorsaError.RateLimitExceeded(_, 5000L))) => ()
      case other => fail(s"expected tagged rate limit, got $other")
    }
  }

  test("malformed JSON body is a data error, not a crash") {
    val c = conn(("quote", "AAPL") -> Right("""{"symbol": "AAPL", "pri"""))
    c.quote(aapl) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("malformed"))
      case other => fail(s"expected Data(malformed), got $other")
    }
  }

  test("5xx with rate-limit prose normalizes through MW4 and trips the MW3 breaker (error_normalization.rs)") {
    val clock = new ManualClock(0)
    val base = conn(("quote", "AAPL") -> Left(HttpError(503, body = "rate limit exceeded, slow down")))
    val stack = Middleware.buildStack(base, cache = None,
      blacklist = Some(Middleware.BlacklistConfig(defaultWindowMs = 9000L)),
      quota = Some(Middleware.QuotaConfig()), clock = clock)
      .fold(e => fail(e.toString), identity)
    // first call: adapter maps 503→Other(prose), quota layer MW4-normalizes
    // the prose to RateLimitExceeded, blacklist layer trips on it
    stack.quote(aapl) match {
      case Left(BorsaError.Connector("fix", BorsaError.RateLimitExceeded(_, _))) => ()
      case other => fail(s"expected MW4-normalized tagged rate limit, got $other")
    }
    // second call: rejected by the breaker without touching the provider
    stack.quote(aapl) match {
      case Left(BorsaError.TemporarilyBlacklisted(reset)) => assert(reset == 9000L)
      case other => fail(s"expected blacklisted, got $other")
    }
  }

  // ------------------------------------------------------------ history

  private val historyBody =
    """{"adjusted": true,
      |"meta": {"timezone": "America/New_York", "utc_offset_seconds": -18000},
      |"candles": [
      |  {"ts": 86400, "open":"2.0","high":"2.5","low":"1.5","close":"2.2","volume":20,"currency":"USD"},
      |  {"ts": 0, "open":"1.0","high":"1.5","low":"0.5","close":"1.2","close_unadj":"1.1","volume":10,"currency":"USD"}
      |],
      |"actions": [
      |  {"ts": 86400, "kind": "dividend", "amount": "0.25", "currency": "USD"},
      |  {"ts": 172800, "kind": "split", "numerator": 2, "denominator": 1}
      |]}""".stripMargin

  test("history payload parses, re-sorts out-of-order candles, maps meta and actions (history_injection.rs)") {
    val c = conn(("history", "AAPL") -> Right(historyBody))
    val Right(h) = c.history(aapl, reqD1)
    assert(h.candles.map(_.ts) == Seq(0L, 86400L), "out-of-order provider pages re-sorted")
    assert(h.candles.head.closeUnadj.contains(BigDecimal("1.1")))
    assert(h.adjusted)
    assert(h.meta.contains(HistoryMeta(Some("America/New_York"), Some(-18000L))))
    assert(h.actions.map(_.kind) == Seq("dividend", "split"))
    assert(h.actions.forall(_.symbol == "AAPL"), "actions tagged with the instrument symbol")
  }

  test("history respects actions=false (history_injection.rs request flags)") {
    val c = conn(("history", "AAPL") -> Right(historyBody))
    val Right(h) = c.history(aapl, reqD1.copy(actions = false))
    assert(h.actions.isEmpty)
  }

  test("candle missing a required OHLC field is a data error") {
    val c = conn(("history", "AAPL") -> Right(
      """{"adjusted": true, "candles": [{"ts": 0, "open":"1.0","high":"1.5","low":"0.5","volume":10,"currency":"USD"}]}"""))
    c.history(aapl, reqD1) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("missing close"))
      case other => fail(s"expected Data(missing close), got $other")
    }
  }

  test("non-numeric price and unknown action kind are data errors") {
    val bad1 = conn(("history", "AAPL") -> Right(
      """{"candles": [{"ts":0,"open":"oops","high":"1","low":"1","close":"1","currency":"USD"}]}"""))
    assert(bad1.history(aapl, reqD1).left.exists(_.isInstanceOf[BorsaError.Data]))
    val bad2 = conn(("history", "AAPL") -> Right(
      """{"candles": [], "actions": [{"ts":0,"kind":"merger"}]}"""))
    bad2.history(aapl, reqD1) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("unknown action kind"))
      case other => fail(s"expected Data(unknown kind), got $other")
    }
  }

  test("empty candle list is a valid (empty) history, dropped silently upstream") {
    val c = conn(("history", "AAPL") -> Right("""{"adjusted": false, "candles": []}"""))
    val Right(h) = c.history(aapl, reqD1)
    assert(h.candles.isEmpty && !h.adjusted && h.meta.isEmpty)
  }

  // ---------------------------------------------------- search & profile

  test("search payload parses results with kind mapping (search_injection.rs)") {
    val c = conn(("search", "app") -> Right(
      """{"results":[{"symbol":"AAPL","name":"Apple","exchange":"NMS","kind":"equity"},
        |{"symbol":"APC.DE","kind":"mystery"}]}""".stripMargin))
    val Right(rs) = c.search("app")
    assert(rs.map(_.symbol) == Seq("AAPL", "APC.DE"))
    assert(rs.head.kind.contains(AssetKind.Equity) && rs(1).kind.isEmpty)
  }

  test("profile and isin parse; esg with no scores is missing data (esg_injection.rs)") {
    val c = conn(
      ("profile", "AAPL") -> Right("""{"name":"Apple Inc.","sector":"Tech","industry":"Hardware"}"""),
      ("isin", "AAPL") -> Right("""{"isin":"US0378331005"}"""),
      ("esg", "AAPL") -> Right("""{}"""))
    assert(c.profile(aapl).exists(_.sector.contains("Tech")))
    assert(c.isin(aapl) == Right("US0378331005"))
    c.esg(aapl) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("missing ESG"))
      case other => fail(s"expected missing ESG data error, got $other")
    }
  }

  test("earnings payload parses the yearly table (earnings_injection.rs)") {
    val c = conn(("earnings", "AAPL") -> Right(
      """{"yearly":[{"year":2022,"revenue":"394328000000","earnings":"99803000000"},{"year":2023}]}"""))
    val Right(e) = c.earnings(aapl)
    assert(e.yearly.map(_.year) == Seq(2022, 2023))
    assert(e.yearly.head.revenue.contains(BigDecimal("394328000000")))
    assert(e.yearly(1).revenue.isEmpty)
  }
}
