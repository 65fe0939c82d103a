package graft.connector

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.router.Fetch

/** End-to-end middleware failover over wire payloads (reference:
  * borsa-middleware/tests/rate_limit_heuristic.rs + blacklist tests,
  * the borsa-yfinance injection tests): a 429 wire response normalizes to
  * a typed RateLimitExceeded (MW4), trips the blacklist breaker with the
  * provider's retry window (MW3), the fallback provider serves through the
  * F3 chain, the fallback's cache absorbs repeats (MW1), blacklisted
  * short-circuits consume no quota budget (MW2 under the MW5 ordering),
  * and the primary recovers once the window elapses — all under one
  * injected clock.
  */
class MiddlewareFailoverSpec extends AnyFunSuite {
  import FixtureConnector._

  private val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)

  /** Mutable, hit-counting transport (the injection-test seam). */
  private class ScriptedTransport(
      @volatile var responses: Map[(String, String), Either[HttpError, String]])
    extends Transport {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    def get(endpoint: String, key: String): Either[HttpError, String] = {
      hits.incrementAndGet()
      responses.getOrElse((endpoint, key), Left(HttpError(404)))
    }
  }

  test("429 wire → MW4 normalize → MW3 blacklist-until → fallback serves → primary recovers after the window") {
    val clock = new ManualClock(1000000L)
    val window = 60000L

    val primaryWire = new ScriptedTransport(Map(
      ("quote", "AAPL") -> Left(HttpError(429, retryAfterMs = Some(window)))))
    val backupWire = new ScriptedTransport(Map(
      ("quote", "AAPL") -> Right("""{"symbol":"AAPL","price":"222.0","currency":"USD"}""")))

    // tiny quota on the primary: if blacklisted short-circuits consumed
    // budget, the recovery call below would see QuotaExceeded instead
    val Right(primary) = Middleware.buildStack(
      new FixtureConnector("primary", primaryWire),
      quota = Some(Middleware.QuotaConfig(limit = 2L, windowMs = 10 * 60 * 1000L)),
      clock = clock)
    val Right(backup) = Middleware.buildStack(
      new FixtureConnector("backup", backupWire), clock = clock)

    def fetchQuote(): Either[BorsaError, Quote] =
      Fetch.prioritySequential(
        Seq("primary" -> (() => primary.quote(aapl)),
            "backup" -> (() => backup.quote(aapl))),
        capability = "quote")

    // 1: wire-level 429 maps to typed RateLimitExceeded, the breaker arms
    // with the provider's retry window, and the fallback serves
    val Right(q1) = fetchQuote()
    assert(q1.price.contains(BigDecimal("222.0")))
    assert(primaryWire.hits.get() == 1 && backupWire.hits.get() == 1)

    // 2: inside the window the primary is short-circuited pre-wire, and
    // the backup's cache absorbs the repeat (quote TTL 2 s > 1 s elapsed)
    clock.t += 1000L
    val Right(q2) = fetchQuote()
    assert(q2.price.contains(BigDecimal("222.0")))
    assert(primaryWire.hits.get() == 1, "blacklisted primary must not touch the wire")
    assert(backupWire.hits.get() == 1, "backup cache must absorb the repeat")
    primary.quote(aapl) match {
      case Left(BorsaError.TemporarilyBlacklisted(resetInMs)) =>
        assert(resetInMs > 0 && resetInMs <= window)
      case other => fail(s"expected TemporarilyBlacklisted, got $other")
    }

    // 3: the window elapses and the provider healed → primary serves
    // again; its quota budget (limit 2: one pre-breaker call, this one)
    // was untouched by the blacklisted rejections
    clock.t += window + 1000L
    primaryWire.responses = Map(
      ("quote", "AAPL") -> Right("""{"symbol":"AAPL","price":"111.0","currency":"USD"}"""))
    val Right(q3) = fetchQuote()
    assert(q3.price.contains(BigDecimal("111.0")), "primary did not recover after the window")
    assert(primaryWire.hits.get() == 2)
  }
}
