package graft.connector

import org.scalatest.funsuite.AnyFunSuite

import graft.connector.FixtureConnector._
import graft.core.Errors.BorsaError
import graft.core.Model._

/** Transport-level retry semantics: transient (429/5xx) retried with
  * exponential backoff, permanent (4xx) fail-fast, Retry-After wins over
  * the schedule — the transport analog of the reference's retry_class
  * taxonomy (borsa-types/src/error.rs:184-224).
  */
class RetryingTransportSpec extends AnyFunSuite {

  private val k = ("quote", "AAPL")
  private def scripted(responses: Either[HttpError, String]*) =
    new ScriptedTransport(Map(k -> responses))

  test("transient 500s retry until success; backoff doubles from base") {
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(
      scripted(Left(HttpError(500)), Left(HttpError(503)), Right("ok")),
      maxAttempts = 3, baseDelayMs = 50, sleep = sleeps.append(_))
    assert(t.get("quote", "AAPL") == Right("ok"))
    assert(sleeps.toSeq == Seq(50L, 100L))
  }

  test("attempts are capped: the final transient error surfaces") {
    val inner = scripted(Left(HttpError(500)), Left(HttpError(502)), Left(HttpError(503)), Right("late"))
    val t = new RetryingTransport(inner, maxAttempts = 3, sleep = _ => ())
    assert(t.get("quote", "AAPL") == Left(HttpError(503)))
    assert(inner.attemptsLeft("quote", "AAPL") == 1, "must stop at maxAttempts")
  }

  test("permanent 404 fails immediately without retrying") {
    val inner = scripted(Left(HttpError(404)), Right("never"))
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(inner, maxAttempts = 3, sleep = sleeps.append(_))
    assert(t.get("quote", "AAPL") == Left(HttpError(404)))
    assert(sleeps.isEmpty && inner.attemptsLeft("quote", "AAPL") == 1)
  }

  test("429 Retry-After overrides the backoff schedule") {
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(
      scripted(Left(HttpError(429, retryAfterMs = Some(777))), Right("ok")),
      maxAttempts = 2, baseDelayMs = 50, sleep = sleeps.append(_))
    assert(t.get("quote", "AAPL") == Right("ok"))
    assert(sleeps.toSeq == Seq(777L))
  }

  test("a hostile Retry-After is clamped to maxDelayMs, never trusted raw") {
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(
      scripted(Left(HttpError(429, retryAfterMs = Some(3600000L))), Right("ok")),
      maxAttempts = 2, baseDelayMs = 50, maxDelayMs = 250, sleep = sleeps.append(_))
    assert(t.get("quote", "AAPL") == Right("ok"))
    assert(sleeps.toSeq == Seq(250L))
  }

  test("backoff caps at maxDelayMs") {
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(
      scripted(Seq.fill(5)(Left(HttpError(500))) :+ Right("ok"): _*),
      maxAttempts = 6, baseDelayMs = 100, maxDelayMs = 250, sleep = sleeps.append(_))
    assert(t.get("quote", "AAPL") == Right("ok"))
    assert(sleeps.toSeq == Seq(100L, 200L, 250L, 250L, 250L))
  }

  test("composes under FixtureConnector: a flaky wire heals transparently, MW4 still sees surviving rate limits") {
    val wire = new ScriptedTransport(Map(
      ("quote", "AAPL") -> Seq(Left(HttpError(503)), Right("""{"symbol":"AAPL","price":"42.5"}""")),
      ("quote", "THROTTLED") -> Seq.fill(3)(Left(HttpError(429, retryAfterMs = Some(1))))))
    val c = new FixtureConnector("yf", new RetryingTransport(wire, maxAttempts = 3, sleep = _ => ()))
    assert(c.quote(Instrument(Symbol("AAPL"), None, AssetKind.Equity))
      .exists(_.price.contains(BigDecimal("42.5"))))
    c.quote(Instrument(Symbol("THROTTLED"), None, AssetKind.Equity)) match {
      case Left(BorsaError.Connector("yf", _: BorsaError.RateLimitExceeded)) => ()
      case other => fail(s"exhausted retries must surface the normalized rate limit, got $other")
    }
  }
}
