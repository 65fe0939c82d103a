package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.{FixtureConnector, MockConnector}
import graft.connector.FixtureConnector._
import graft.core.Model._
import graft.routing.Policy

/** Rate-limited primary with router fallback (reference:
  * borsa/examples/16_yf_rate_limited.rs — a quota-bound yfinance
  * connector falls back to the mock, then recovers when the window
  * resets).
  *
  * Here the throttle is on the WIRE: the recorded transport answers one
  * quote, then two 429s, then recovers. The retry decorator burns its
  * attempts on the 429s (honoring Retry-After), the connector maps the
  * surviving throttle to a typed RateLimitExceeded (MW4's shape), and the
  * router falls back to the mock — then call three lands on the primary
  * again, exactly the reference's three-call arc but fully deterministic.
  */
object Ex16RateLimited extends Example {
  val name = "16 rate-limited primary + fallback"

  def run(spark: SparkSession): Seq[String] = {
    val quoteJson = """{"symbol":"AAPL","price":"123.45","currency":"USD"}"""
    val wire = new ScriptedTransport(Map(("quote", "AAPL") -> Seq(
      Right(quoteJson),                                // call 1: served
      Left(HttpError(429, retryAfterMs = Some(1))),    // call 2, attempt 1
      Left(HttpError(429, retryAfterMs = Some(1))),    // call 2, attempt 2 -> give up
      Right(quoteJson))))                              // call 3: window reset
    val yf = new FixtureConnector("yf",
      new RetryingTransport(wire, maxAttempts = 2, sleep = _ => ()))
    val g = new Graft(spark, Seq(yf, new MockConnector("mock")),
      Policy.ProviderPolicy().withGlobal(Seq("yf", "mock")),
      middleware = false) // no cache: every call hits the wire, like the reference demo

    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    def call(label: String): String = g.quote(aapl) match {
      case Right(q) =>
        val src = if (q.price.contains(BigDecimal("123.45"))) "primary" else "mock fallback"
        s"$label: price=${q.price.getOrElse("?")} served by $src"
      case Left(e) => s"$label: failed: $e"
    }
    Seq(
      call("call 1 (quota available)"),
      call("call 2 (throttled wire) "),
      call("call 3 (window reset)   "))
  }
}
