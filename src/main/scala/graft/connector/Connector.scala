package graft.connector

import graft.core.Errors.BorsaError
import graft.core.Model._

/** Connector SPI (reference: borsa-core/src/connector.rs:309-451 — optional
  * capability accessors; absence = capability unsupported).
  *
  * Record-level API: providers return small typed payloads; the router
  * composes them. Bulk/scan paths (history at scale) go through the
  * DataFrame-based router (graft.router.HistoryRouter) instead — the
  * connector layer is control-plane only.
  */
trait Connector {
  def name: String
  def supportsKind(kind: AssetKind): Boolean = true
  def capabilities: Set[String]

  /** Supported native candle intervals (drives R6 negotiation). */
  def supportedIntervals: Seq[Interval] = Seq.empty

  def quote(inst: Instrument): Either[BorsaError, Quote] =
    Left(BorsaError.Unsupported("quote"))
  def history(inst: Instrument, req: HistoryRequest): Either[BorsaError, HistoryResponse] =
    Left(BorsaError.Unsupported("history"))
  def search(query: String): Either[BorsaError, Seq[SearchResult]] =
    Left(BorsaError.Unsupported("search"))
  def profile(inst: Instrument): Either[BorsaError, Profile] =
    Left(BorsaError.Unsupported("profile"))
  def isin(inst: Instrument): Either[BorsaError, String] =
    Left(BorsaError.Unsupported("isin"))

  /** Generic single-payload capability call (the ×19 macro surface Q4:
    * earnings, statements, holders, esg, news, options… — uniform routing,
    * no new data-plane operators).
    */
  def fetchCapability(capability: String, inst: Instrument): Either[BorsaError, Map[String, String]] =
    Left(BorsaError.Unsupported(capability))

  // Typed accessors for the structured capabilities (reference role traits,
  // borsa-core/src/connector.rs:52-315). Default: unsupported.
  import graft.core.Payloads._
  def earnings(inst: Instrument): Either[BorsaError, Earnings] =
    Left(BorsaError.Unsupported("earnings"))
  def incomeStatement(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    Left(BorsaError.Unsupported("income-statement"))
  def balanceSheet(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    Left(BorsaError.Unsupported("balance-sheet"))
  def cashflow(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    Left(BorsaError.Unsupported("cashflow"))
  def esg(inst: Instrument): Either[BorsaError, EsgScores] =
    Left(BorsaError.Unsupported("esg"))
  def news(inst: Instrument, req: NewsRequest): Either[BorsaError, Seq[NewsArticle]] =
    Left(BorsaError.Unsupported("news"))
  def optionsExpirations(inst: Instrument): Either[BorsaError, Seq[Long]] =
    Left(BorsaError.Unsupported("options-expirations"))
  def optionChain(inst: Instrument, expiration: Option[Long]): Either[BorsaError, OptionChain] =
    Left(BorsaError.Unsupported("option-chain"))
  def holders(inst: Instrument, kind: HolderKind): Either[BorsaError, Seq[HolderRow]] =
    Left(BorsaError.Unsupported(kind.id))
  def calendar(inst: Instrument): Either[BorsaError, CalendarEvents] =
    Left(BorsaError.Unsupported("calendar"))
  def recommendations(inst: Instrument): Either[BorsaError, Seq[Recommendation]] =
    Left(BorsaError.Unsupported("recommendations"))
  def recommendationsSummary(inst: Instrument): Either[BorsaError, RecommendationSummary] =
    Left(BorsaError.Unsupported("recommendations-summary"))
  def priceTarget(inst: Instrument): Either[BorsaError, PriceTarget] =
    Left(BorsaError.Unsupported("price-target"))
  def upgradesDowngrades(inst: Instrument): Either[BorsaError, Seq[UpgradeDowngrade]] =
    Left(BorsaError.Unsupported("upgrades-downgrades"))
}

final case class SearchResult(
    symbol: String,
    name: Option[String],
    exchange: Option[String],
    kind: Option[AssetKind])

final case class Profile(
    name: Option[String],
    sector: Option[String],
    industry: Option[String],
    isin: Option[String])

/** Injectable clock so middleware (TTL cache, quota windows, blacklist,
  * backoff) is deterministic under test.
  */
trait Clock extends Serializable { def nowMs: Long }
object SystemClock extends Clock { def nowMs: Long = System.currentTimeMillis() }
final class ManualClock(var t: Long = 0L) extends Clock {
  def nowMs: Long = t
  def advance(ms: Long): Unit = t += ms
}

/** MW6 call-origin scoping (borsa-core/src/middleware.rs:13-77): internal
  * fan-out calls (e.g. the sub-requests of `info`) bypass quota/blacklist.
  */
sealed trait CallOrigin
object CallOrigin {
  case object External extends CallOrigin
  final case class Internal(parent: String, stage: String) extends CallOrigin
}
final case class CallContext(origin: CallOrigin = CallOrigin.External)
