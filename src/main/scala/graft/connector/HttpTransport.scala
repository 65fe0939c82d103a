package graft.connector

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.connector.FixtureConnector.{HttpError, Transport}

/** Live HTTP implementation of the connector [[Transport]] SPI — the one
  * piece the fixture stack left to a deploying user (the network face of
  * the reference's adapter, /root/reference/borsa-yfinance/src/adapter.rs).
  * Built on the JDK's `java.net.http.HttpClient` (no extra dependency) and
  * kept deliberately thin: everything above the wire — retry/backoff
  * ([[FixtureConnector.RetryingTransport]]), parse/validate/normalize/
  * error-map ([[FixtureConnector]]), cache/quota/blacklist (Middleware) —
  * already exists and is transport-agnostic, so this class only turns a
  * (endpoint, key) pair into a GET and a response into body-or-HttpError.
  *
  * Mapping rules:
  *  - 2xx → Right(body)
  *  - any other status → Left(HttpError(status, body, retryAfterMs)) with
  *    an integer-seconds `Retry-After` header honored (the HTTP-date form
  *    is ignored — the retry layer then falls back to its own backoff)
  *  - request/connect timeout → status 598, connection-level I/O failure →
  *    status 599: both ≥ 500, so the retry layer classes them TRANSIENT
  *    and the error-map surfaces them as provider errors, mirroring how
  *    the reference maps reqwest transport errors to retryable
  *    Connector(Other) (adapter.rs error mapping)
  *
  * URL shape: `{base}/{endpoint}/{url-encoded key}`. Interactive auth,
  * redirects beyond NORMAL policy, and non-GET verbs are out of scope —
  * the reference's provider API is read-only GETs.
  */
object HttpTransport {
  /** Production wiring in one call: live HTTP + transport-level retry under
    * the full parse/validate/normalize/error-map connector, ready to hand
    * to `new Graft(spark, Seq(...))` or `Graft.fromConfig`.
    */
  def connector(
      name: String,
      baseUrl: String,
      headers: Map[String, String] = Map.empty,
      supportedIntervals: Seq[graft.core.Model.Interval] =
        Seq(graft.core.Model.Interval.I1m, graft.core.Model.Interval.I1h,
          graft.core.Model.Interval.D1),
      maxAttempts: Int = 3,
      baseDelayMs: Long = 50L,
      maxDelayMs: Long = 5000L): FixtureConnector =
    new FixtureConnector(name,
      new FixtureConnector.RetryingTransport(
        new HttpTransport(baseUrl, headers),
        maxAttempts = maxAttempts, baseDelayMs = baseDelayMs, maxDelayMs = maxDelayMs),
      supportedIntervals)
}

final class HttpTransport(
    baseUrl: String,
    headers: Map[String, String] = Map.empty,
    connectTimeoutMs: Long = 5000L,
    requestTimeoutMs: Long = 10000L) extends Transport {
  require(baseUrl.nonEmpty && !baseUrl.endsWith("/"),
    s"baseUrl must be non-empty without a trailing slash, got '$baseUrl'")

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def retryAfterMs(resp: HttpResponse[String]): Option[Long] = {
    import scala.jdk.OptionConverters._
    // bound BEFORE the seconds→ms multiply: a hostile huge value would wrap
    // Long negative and escape every downstream clamp into Thread.sleep
    resp.headers.firstValue("Retry-After").toScala
      .flatMap(_.toLongOption)
      .filter(v => v >= 0 && v <= Long.MaxValue / 1000L)
      .map(_ * 1000L)
  }

  def get(endpoint: String, key: String): Either[HttpError, String] = {
    // URLEncoder is FORM encoding: space becomes '+', which in a path
    // segment is a literal plus — percent-encode it for the path
    val encoded = java.net.URLEncoder.encode(key, StandardCharsets.UTF_8)
      .replace("+", "%20")
    val builder = HttpRequest.newBuilder(URI.create(s"$baseUrl/$endpoint/$encoded"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .GET()
    headers.foreach { case (k, v) => builder.header(k, v) }
    try {
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(HttpError(resp.statusCode(), resp.body(), retryAfterMs(resp)))
    } catch {
      case e: HttpTimeoutException =>
        Left(HttpError(598, s"timeout: ${e.getMessage}"))
      case e: InterruptedException =>
        // a thread interrupt must not escape the Either contract as a raw
        // checked exception from inside the retry loop; restore the flag so
        // the caller's executor still observes the interrupt, and map to a
        // sub-500 status (NON-transient — retrying an interrupted call would
        // fight the cancellation)
        Thread.currentThread().interrupt()
        Left(HttpError(499, s"interrupted: ${e.getMessage}"))
      case e: java.io.IOException =>
        Left(HttpError(599, s"connection failure: ${e.getMessage}"))
    }
  }
}
