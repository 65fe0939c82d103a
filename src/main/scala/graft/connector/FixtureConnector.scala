package graft.connector

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.core.Payloads._

/** Fixture-backed provider connector — the network-free analog of the
  * reference's real HTTP adapter (/root/reference/borsa-yfinance/src/
  * adapter.rs): recorded wire payloads flow through a REAL
  * parse → validate → normalize → error-map path, so the router,
  * middleware (MW4 rate-limit normalization in particular) and history
  * pipeline are exercised against provider-shaped data rather than
  * pre-built model objects (MockConnector's shortcut).
  *
  * Transport SPI: production would be HTTP; tests inject
  * [[FixtureConnector.RecordedTransport]] with recorded bodies/failures
  * (the reference's injection-test pattern, borsa-yfinance/tests/
  * *_injection.rs).
  */
object FixtureConnector {

  /** Transport-level failure (an HTTP status + optional rate-limit window). */
  final case class HttpError(status: Int, body: String = "", retryAfterMs: Option[Long] = None)

  trait Transport {
    /** GET `endpoint` for `key` (symbol or query) → raw body. */
    def get(endpoint: String, key: String): Either[HttpError, String]
  }

  /** Recorded fixtures keyed by (endpoint, key); anything unrecorded is a
    * provider 404.
    */
  final class RecordedTransport(
      fixtures: Map[(String, String), Either[HttpError, String]]) extends Transport {
    def get(endpoint: String, key: String): Either[HttpError, String] =
      fixtures.getOrElse((endpoint, key), Left(HttpError(404)))
  }

  /** Scripted transport for retry tests: each (endpoint, key) holds a QUEUE
    * of responses consumed one per attempt (the reference's injection-test
    * pattern with attempt-varying bodies).
    */
  final class ScriptedTransport(
      script: Map[(String, String), Seq[Either[HttpError, String]]]) extends Transport {
    private val remaining = scala.collection.mutable.Map(
      script.view.mapValues(_.toList).toSeq: _*)
    def get(endpoint: String, key: String): Either[HttpError, String] = synchronized {
      remaining.get((endpoint, key)) match {
        case Some(next :: rest) => remaining((endpoint, key)) = rest; next
        case _ => Left(HttpError(404))
      }
    }
    def attemptsLeft(endpoint: String, key: String): Int =
      synchronized(remaining.get((endpoint, key)).map(_.size).getOrElse(0))
  }

  /** Transport-level retry with exponential backoff, honoring the error
    * taxonomy of the reference (`retry_class`, borsa-types/src/error.rs:
    * 184-224): TRANSIENT failures — 429 and 5xx, the shapes that map to
    * RateLimitExceeded / Connector(Other) — are retried up to `maxAttempts`
    * total tries; PERMANENT failures (every 4xx: NotFound / Data) fail
    * immediately without burning attempts. A 429 carrying a Retry-After
    * window overrides the backoff schedule, matching how the middleware's
    * rate-limit normalization (MW4) respects provider-stated windows.
    *
    * `sleep` is injectable so specs assert the schedule without waiting;
    * delays double per attempt from `baseDelayMs` (50ms → 100ms → ...),
    * capped at `maxDelayMs`.
    */
  final class RetryingTransport(
      inner: Transport,
      maxAttempts: Int = 3,
      baseDelayMs: Long = 50L,
      maxDelayMs: Long = 5000L,
      sleep: Long => Unit = Thread.sleep) extends Transport {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

    private def transient(e: HttpError): Boolean = e.status == 429 || e.status >= 500

    def get(endpoint: String, key: String): Either[HttpError, String] = {
      var attempt = 1
      var result = inner.get(endpoint, key)
      while (result.left.exists(transient) && attempt < maxAttempts) {
        val backoff = math.min(baseDelayMs << (attempt - 1), maxDelayMs)
        // provider-stated window is honored but clamped to [0, maxDelayMs]:
        // a buggy/hostile 429 must neither pin the calling thread past
        // maxDelayMs nor smuggle a negative value into Thread.sleep
        val delay = math.max(0L, math.min(
          result.left.toOption.flatMap(_.retryAfterMs).getOrElse(backoff), maxDelayMs))
        sleep(delay)
        attempt += 1
        result = inner.get(endpoint, key)
      }
      result
    }
  }
}

final class FixtureConnector(
    override val name: String,
    transport: FixtureConnector.Transport,
    override val supportedIntervals: Seq[Interval] =
      Seq(Interval.I1m, Interval.I1h, Interval.D1)) extends Connector {
  import FixtureConnector._

  def capabilities: Set[String] =
    Set("quote", "history", "search", "profile", "isin", "earnings", "esg")

  private val mapper = new ObjectMapper

  // ------------------------------------------------------- error mapping
  // adapter.rs:239-256: status/shape → typed BorsaError. The body text is
  // preserved in Other so MW4's normalization (a provider that answers 5xx
  // with "rate limit" prose) still recognizes throttling.

  private def mapHttp(e: HttpError, capability: String, what: String): BorsaError = e.status match {
    case 404 => BorsaError.NotFound(s"$capability for $what")
    case 429 => BorsaError.Connector(name,
      BorsaError.RateLimitExceeded(0, e.retryAfterMs.getOrElse(0L)))
    case s => BorsaError.Connector(name,
      BorsaError.Other(s"http status $s during $capability: ${e.body}"))
  }

  private def parsed[A](capability: String, key: String)(
      parse: JsonNode => Either[BorsaError, A]): Either[BorsaError, A] =
    transport.get(capability, key).left.map(mapHttp(_, capability, key)).flatMap { body =>
      Try(mapper.readTree(body)) match {
        case Failure(_) | Success(null) =>
          Left(BorsaError.Data(s"malformed $capability payload for $key"))
        case Success(root) => parse(root)
      }
    }

  // ------------------------------------------------------- field helpers

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)
  private def optLong(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong)
  private def optDecimal(n: JsonNode, f: String): Option[BigDecimal] =
    Option(n.get(f)).filterNot(_.isNull).map(v => BigDecimal(new java.math.BigDecimal(v.asText)))
  private def reqText(n: JsonNode, f: String, cap: String): Either[BorsaError, String] =
    optText(n, f).toRight(BorsaError.Data(s"missing $f in $cap payload"))
  private def reqLong(n: JsonNode, f: String, cap: String): Either[BorsaError, Long] =
    optLong(n, f).toRight(BorsaError.Data(s"missing $f in $cap payload"))
  private def reqDecimal(n: JsonNode, f: String, cap: String): Either[BorsaError, BigDecimal] =
    Option(n.get(f)).filterNot(_.isNull)
      .toRight(BorsaError.Data(s"missing $f in $cap payload"))
      .flatMap(v => Try(BigDecimal(new java.math.BigDecimal(v.asText))).toEither.left
        .map(_ => BorsaError.Data(s"non-numeric $f in $cap payload")))
  private def elems(n: JsonNode, f: String): Seq[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull).map(_.elements.asScala.toSeq).getOrElse(Seq.empty)

  private def sequenceE[A](xs: Seq[Either[BorsaError, A]]): Either[BorsaError, Seq[A]] =
    xs.foldLeft[Either[BorsaError, Vector[A]]](Right(Vector.empty)) {
      case (acc, x) => acc.flatMap(v => x.map(v :+ _))
    }

  // ------------------------------------------------------------ parsers

  override def quote(inst: Instrument): Either[BorsaError, Quote] =
    parsed("quote", inst.symbol.value) { root =>
      reqText(root, "symbol", "quote").map { sym =>
        Quote(sym,
          price = optDecimal(root, "price"),
          previousClose = optDecimal(root, "previousClose"),
          currency = optText(root, "currency"),
          shortname = optText(root, "shortname"),
          exchange = optText(root, "exchange"),
          marketState = optText(root, "marketState"),
          dayVolume = optLong(root, "dayVolume"))
      }
    }

  /** History payload → HistoryResponse, with the adapter's normalization:
    * candles re-sorted by ts (providers page out of order), each candle
    * validated for required OHLC + currency, optional raw-close provenance
    * and actions carried through, meta mapped from tz/offset fields.
    */
  override def history(inst: Instrument, req: HistoryRequest): Either[BorsaError, HistoryResponse] =
    parsed("history", inst.symbol.value) { root =>
      val sym = inst.symbol.value
      val candlesE = sequenceE(elems(root, "candles").map { c =>
        for {
          ts <- reqLong(c, "ts", "history")
          open <- reqDecimal(c, "open", "history")
          high <- reqDecimal(c, "high", "history")
          low <- reqDecimal(c, "low", "history")
          close <- reqDecimal(c, "close", "history")
          currency <- reqText(c, "currency", "history")
        } yield Candle(sym, ts, open, high, low, close,
          optDecimal(c, "close_unadj"), optLong(c, "volume"), currency)
      })
      val actionsE = sequenceE(elems(root, "actions").map { a =>
        for {
          ts <- reqLong(a, "ts", "history.actions")
          kind <- reqText(a, "kind", "history.actions").flatMap {
            case k @ ("dividend" | "split" | "capital_gain") => Right(k)
            case other => Left(BorsaError.Data(s"unknown action kind '$other' in history payload"))
          }
        } yield Action(sym, ts, kind, optDecimal(a, "amount"), optText(a, "currency"),
          optLong(a, "numerator"), optLong(a, "denominator"))
      })
      for {
        candles <- candlesE
        actions <- actionsE
      } yield {
        val meta = Option(root.get("meta")).filterNot(_.isNull).map(m =>
          HistoryMeta(optText(m, "timezone"), optLong(m, "utc_offset_seconds")))
        HistoryResponse(
          candles.sortBy(_.ts),
          if (req.actions) actions else Seq.empty,
          adjusted = Option(root.get("adjusted")).exists(_.asBoolean),
          meta = meta)
      }
    }

  override def search(query: String): Either[BorsaError, Seq[SearchResult]] =
    parsed("search", query) { root =>
      sequenceE(elems(root, "results").map { r =>
        reqText(r, "symbol", "search").map { sym =>
          SearchResult(sym, optText(r, "name"), optText(r, "exchange"),
            optText(r, "kind").flatMap {
              case "equity" => Some(AssetKind.Equity)
              case "crypto" => Some(AssetKind.Crypto)
              case "fund"   => Some(AssetKind.Fund)
              case _        => None
            })
        }
      })
    }

  override def profile(inst: Instrument): Either[BorsaError, Profile] =
    parsed("profile", inst.symbol.value) { root =>
      Right(Profile(optText(root, "name"), optText(root, "sector"),
        optText(root, "industry"), optText(root, "isin")))
    }

  override def isin(inst: Instrument): Either[BorsaError, String] =
    parsed("isin", inst.symbol.value)(reqText(_, "isin", "isin"))

  override def earnings(inst: Instrument): Either[BorsaError, Earnings] =
    parsed("earnings", inst.symbol.value) { root =>
      sequenceE(elems(root, "yearly").map { y =>
        for {
          year <- reqLong(y, "year", "earnings")
        } yield EarningsYear(year.toInt, optDecimal(y, "revenue"), optDecimal(y, "earnings"))
      }).map(rows => Earnings(rows, Seq.empty, Seq.empty))
    }

  override def esg(inst: Instrument): Either[BorsaError, EsgScores] =
    parsed("esg", inst.symbol.value) { root =>
      val scores = EsgScores(optDecimal(root, "environmental"),
        optDecimal(root, "social"), optDecimal(root, "governance"))
      // adapter.rs:617: an ESG payload with no scores at all is missing data
      if (scores.environmental.isEmpty && scores.social.isEmpty && scores.governance.isEmpty)
        Left(BorsaError.Data("missing ESG scores"))
      else Right(scores)
    }
}
