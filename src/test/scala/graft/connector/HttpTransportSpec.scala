package graft.connector

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.connector.FixtureConnector._
import graft.core.Errors.BorsaError
import graft.core.Model._

/** The live HTTP transport against a REAL loopback server (JDK
  * com.sun.net.httpserver — no network egress, no extra dependency): the
  * full wire → retry → parse → error-map stack runs end to end, closing
  * the "deploying user writes the network piece" gap with an actually
  * exercised implementation.
  */
class HttpTransportSpec extends AnyFunSuite {

  /** Run `f` against a scripted loopback server. `script` maps a path
    * (e.g. "/quote/AAPL") to a QUEUE of (status, body, retryAfterSecs)
    * responses, consumed one per request; exhausted or unknown paths 404.
    */
  private def withServer[A](script: Map[String, Seq[(Int, String, Option[Long])]])(
      f: String => A): A = {
    val remaining = scala.collection.mutable.Map(script.view.mapValues(_.toList).toSeq: _*)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      // raw path: script keys assert the ENCODED on-the-wire form
      val path = ex.getRequestURI.getRawPath
      val (status, body, retryAfter) = remaining.synchronized {
        remaining.get(path) match {
          case Some(next :: rest) =>
            remaining(path) = rest
            next
          case _ => (404, "not found", None)
        }
      }
      retryAfter.foreach(s => ex.getResponseHeaders.add("Retry-After", s.toString))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)

  test("2xx body flows through the full parse path: wire JSON to a typed quote") {
    withServer(Map("/quote/AAPL" -> Seq(
      (200, """{"symbol":"AAPL","price":"123.45","currency":"USD"}""", None)))) { base =>
      val c = new FixtureConnector("yf", new HttpTransport(base))
      assert(c.quote(aapl).exists(q => q.price.contains(BigDecimal("123.45"))
        && q.currency.contains("USD")))
    }
  }

  test("non-2xx maps to HttpError with status, body and integer Retry-After in ms") {
    withServer(Map("/quote/AAPL" -> Seq((429, "slow down", Some(7L))))) { base =>
      val t = new HttpTransport(base)
      assert(t.get("quote", "AAPL") == Left(HttpError(429, "slow down", Some(7000L))))
    }
  }

  test("transient 5xx heals through RetryingTransport; the wire sees every attempt") {
    withServer(Map("/quote/AAPL" -> Seq(
      (503, "warming up", None),
      (500, "still warming", None),
      (200, """{"symbol":"AAPL","price":"9.99"}""", None)))) { base =>
      val sleeps = scala.collection.mutable.Buffer.empty[Long]
      val c = new FixtureConnector("yf",
        new RetryingTransport(new HttpTransport(base), maxAttempts = 3, sleep = sleeps.append(_)))
      assert(c.quote(aapl).exists(_.price.contains(BigDecimal("9.99"))))
      assert(sleeps.size == 2, "two failed attempts, two backoffs")
    }
  }

  test("provider 404 maps to NotFound through the connector error path") {
    withServer(Map.empty) { base =>
      new FixtureConnector("yf", new HttpTransport(base)).quote(aapl) match {
        case Left(BorsaError.NotFound(what)) => assert(what.contains("AAPL"))
        case other => fail(s"expected NotFound, got $other")
      }
    }
  }

  test("connection refusal surfaces as transient 599 and is retried") {
    // bind then immediately stop: the port is real but refuses connections
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    server.start(); server.stop(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val t = new RetryingTransport(
      new HttpTransport(s"http://127.0.0.1:$port", connectTimeoutMs = 500, requestTimeoutMs = 500),
      maxAttempts = 2, sleep = sleeps.append(_))
    t.get("quote", "AAPL") match {
      case Left(HttpError(599, body, None)) => assert(body.contains("connection failure"))
      case other => fail(s"expected transient 599, got $other")
    }
    assert(sleeps.size == 1, "599 is transient: one retry must have happened")
  }

  test("HttpTransport.connector factory: one call yields the full retrying live stack") {
    withServer(Map("/quote/AAPL" -> Seq(
      (502, "bad gateway", None),
      (200, """{"symbol":"AAPL","price":"7.77"}""", None)))) { base =>
      val c = HttpTransport.connector("yf", base, baseDelayMs = 1L)
      assert(c.quote(aapl).exists(_.price.contains(BigDecimal("7.77"))))
    }
  }

  test("thread interrupt maps to non-transient 499 and the interrupt flag survives") {
    withServer(Map("/quote/AAPL" -> Seq((200, "ok", None)))) { base =>
      val t = new HttpTransport(base)
      // pre-set the interrupt flag: HttpClient.send blocks on an internal
      // future whose wait observes it and throws InterruptedException
      Thread.currentThread().interrupt()
      val out = t.get("quote", "AAPL")
      // reads AND clears in one call, so later tests aren't poisoned either way
      val flagRestored = Thread.interrupted()
      out match {
        case Left(HttpError(499, body, None)) =>
          assert(body.contains("interrupted"))
          assert(flagRestored, "the transport must restore the interrupt flag")
        case other => fail(s"expected non-transient 499, got $other")
      }
    }
  }

  test("keys are URL-encoded on the wire") {
    withServer(Map("/search/a%2Fb%20c" -> Seq((200, "ok", None)))) { base =>
      assert(new HttpTransport(base).get("search", "a/b c") == Right("ok"))
    }
  }
}
