package graft.connector

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.core.Payloads._

/** Uniform decorator base: middleware implements ONE `wrap` and every
  * capability call — typed or generic — flows through it with its
  * capability id and cache key. Guarantees new capabilities can never
  * accidentally bypass cache/quota/blacklist by being left unwrapped.
  */
trait WrappedConnector extends Connector {
  def inner: Connector

  protected def wrap[V](capability: String, key: Any)(load: => Either[BorsaError, V]): Either[BorsaError, V]

  def name: String = inner.name
  override def supportsKind(kind: AssetKind): Boolean = inner.supportsKind(kind)
  def capabilities: Set[String] = inner.capabilities
  override def supportedIntervals: Seq[Interval] = inner.supportedIntervals

  override def quote(inst: Instrument): Either[BorsaError, Quote] =
    wrap("quote", inst)(inner.quote(inst))
  override def history(inst: Instrument, req: HistoryRequest): Either[BorsaError, HistoryResponse] =
    wrap("history", (inst, req))(inner.history(inst, req))
  override def search(query: String): Either[BorsaError, Seq[SearchResult]] =
    wrap("search", query)(inner.search(query))
  override def profile(inst: Instrument): Either[BorsaError, Profile] =
    wrap("profile", inst)(inner.profile(inst))
  override def isin(inst: Instrument): Either[BorsaError, String] =
    wrap("isin", inst)(inner.isin(inst))
  override def fetchCapability(cap: String, inst: Instrument): Either[BorsaError, Map[String, String]] =
    wrap(cap, inst)(inner.fetchCapability(cap, inst))
  override def earnings(inst: Instrument): Either[BorsaError, Earnings] =
    wrap("earnings", inst)(inner.earnings(inst))
  override def incomeStatement(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    wrap("income-statement", (inst, quarterly))(inner.incomeStatement(inst, quarterly))
  override def balanceSheet(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    wrap("balance-sheet", (inst, quarterly))(inner.balanceSheet(inst, quarterly))
  override def cashflow(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    wrap("cashflow", (inst, quarterly))(inner.cashflow(inst, quarterly))
  override def esg(inst: Instrument): Either[BorsaError, EsgScores] =
    wrap("esg", inst)(inner.esg(inst))
  override def news(inst: Instrument, req: NewsRequest): Either[BorsaError, Seq[NewsArticle]] =
    wrap("news", (inst, req))(inner.news(inst, req))
  override def optionsExpirations(inst: Instrument): Either[BorsaError, Seq[Long]] =
    wrap("options-expirations", inst)(inner.optionsExpirations(inst))
  override def optionChain(inst: Instrument, expiration: Option[Long]): Either[BorsaError, OptionChain] =
    wrap("option-chain", (inst, expiration))(inner.optionChain(inst, expiration))
  override def holders(inst: Instrument, kind: HolderKind): Either[BorsaError, Seq[HolderRow]] =
    wrap(kind.id, inst)(inner.holders(inst, kind))
  override def calendar(inst: Instrument): Either[BorsaError, CalendarEvents] =
    wrap("calendar", inst)(inner.calendar(inst))
  override def recommendations(inst: Instrument): Either[BorsaError, Seq[Recommendation]] =
    wrap("recommendations", inst)(inner.recommendations(inst))
  override def recommendationsSummary(inst: Instrument): Either[BorsaError, RecommendationSummary] =
    wrap("recommendations-summary", inst)(inner.recommendationsSummary(inst))
  override def priceTarget(inst: Instrument): Either[BorsaError, PriceTarget] =
    wrap("price-target", inst)(inner.priceTarget(inst))
  override def upgradesDowngrades(inst: Instrument): Either[BorsaError, Seq[UpgradeDowngrade]] =
    wrap("upgrades-downgrades", inst)(inner.upgradesDowngrades(inst))
}
