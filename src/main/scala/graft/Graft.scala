package graft

import org.apache.spark.sql.SparkSession

import graft.connector.{CallContext, Connector, Middleware, Profile, SearchResult}
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.router.{Fetch, HistoryOrchestrator, InfoRouter, SearchRouter}
import graft.routing.Policy
import graft.streaming.{StreamController, StreamPlanner, SupervisorFsm}

/** User-facing façade — the `Borsa` API surface re-expressed on Spark
  * (reference entry points under borsa/src/router). A user of the reference
  * switches by constructing `Graft(spark, connectors, policy)` and calling
  * the same verbs: quote / quotes / history / download / search / info /
  * fastInfo / profile / isin / capability / streamQuotes.
  *
  * Construction wraps every connector in the middleware stack
  * (cache → blacklist → quota, MW5 order) unless disabled.
  */
final class Graft(
    spark: SparkSession,
    rawConnectors: Seq[Connector],
    policy: Policy.ProviderPolicy = Policy.ProviderPolicy(),
    fetchConfig: Fetch.Config = Fetch.Config(),
    historyConfig: HistoryOrchestrator.Config = HistoryOrchestrator.Config(),
    exchangePrefs: Policy.ExchangePreference = Policy.ExchangePreference(),
    middleware: Boolean = true) {

  val connectors: Seq[Connector] =
    if (!middleware) rawConnectors
    else rawConnectors.map(c => Middleware.buildStack(c).fold(e => throw new IllegalStateException(e.toString), identity))

  private def ordered(inst: Instrument): Seq[Connector] = {
    val ctx = Policy.Context(Some(inst.symbol), Some(inst.kind), inst.exchange)
    policy.orderedForContext(ctx, connectors.map(_.name))
      .flatMap(n => connectors.find(_.name == n))
      .filter(_.supportsKind(inst.kind))
  }

  private def routed[A](inst: Instrument, capability: String, notFound: String)(
      call: Connector => Either[BorsaError, A],
      postOk: A => Either[BorsaError, A] = (a: A) => Right(a)): Either[BorsaError, A] = {
    val providers = ordered(inst)
      .filter(_.capabilities.contains(capability))
      .map(c => c.name -> (() => call(c)))
    fetchConfig.strategy match {
      case Fetch.Strategy.PriorityWithFallback =>
        Fetch.prioritySequential(providers, capability, fetchConfig, Some(notFound), postOk)
      case Fetch.Strategy.Latency =>
        Fetch.latencyRace(providers, capability, fetchConfig, Some(notFound), postOk)
    }
  }

  // ------------------------------------------------------------- verbs

  def quote(inst: Instrument): Either[BorsaError, Quote] =
    routed(inst, "quote", s"quote for ${inst.symbol.value}")(
      _.quote(inst), InfoRouter.enforceQuoteExchange(inst)) // F6 post-hook

  /** Q1 batch quotes: partial successes + per-symbol failures. */
  def quotes(instruments: Seq[Instrument]): (Seq[Quote], Map[String, BorsaError]) =
    InfoRouter.quotesBatch(instruments, quote)

  def history(inst: Instrument, req: HistoryRequest): Either[BorsaError, HistoryOrchestrator.HistoryResult] =
    HistoryOrchestrator.history(spark, inst, req, connectors, policy, historyConfig)

  def download(instruments: Seq[Instrument], req: HistoryRequest): Either[BorsaError, HistoryOrchestrator.HistoryResult] =
    HistoryOrchestrator.download(spark, instruments, req, connectors, policy, historyConfig)

  def search(query: String, kind: Option[AssetKind] = None, limit: Option[Int] = None): Either[BorsaError, Report[Seq[SearchResult]]] = {
    val ctx = Policy.Context(None, kind, None)
    val providers = policy.orderedForContext(ctx, connectors.map(_.name))
      .flatMap(n => connectors.find(_.name == n))
      .filter(_.capabilities.contains("search"))
      .map(c => c.name -> (() => c.search(query)))
    SearchRouter.search(providers, exchangePrefs, kind, limit)
  }

  def profile(inst: Instrument): Either[BorsaError, Profile] =
    routed(inst, "profile", s"profile for ${inst.symbol.value}")(_.profile(inst))

  def isin(inst: Instrument): Either[BorsaError, String] =
    routed(inst, "isin", s"isin for ${inst.symbol.value}")(_.isin(inst))

  /** Q2 composed info with warnings (internal sub-calls bypass quota via
    * MW6 in a production wiring; here composed from the routed verbs).
    */
  def info(inst: Instrument): Either[BorsaError, Report[InfoRouter.Info]] =
    InfoRouter.info(inst, () => quote(inst), () => profile(inst), () => isin(inst))

  def fastInfo(inst: Instrument): Either[BorsaError, InfoRouter.FastInfo] =
    quote(inst).flatMap(InfoRouter.fastInfo)

  /** Q4 generic capability fetch (any of the 19 single-payload
    * capabilities, untyped map form).
    */
  def capability(inst: Instrument, capabilityId: String): Either[BorsaError, Map[String, String]] =
    routed(inst, capabilityId, s"$capabilityId for ${inst.symbol.value}")(
      _.fetchCapability(capabilityId, inst))

  // Typed Q4 verbs (same routing engine, structured payloads)
  import graft.core.Payloads._
  def earnings(inst: Instrument): Either[BorsaError, Earnings] =
    routed(inst, "earnings", s"earnings for ${inst.symbol.value}")(_.earnings(inst))
  def incomeStatement(inst: Instrument, quarterly: Boolean = false): Either[BorsaError, Seq[StatementRow]] =
    routed(inst, "income-statement", s"income statement for ${inst.symbol.value}")(
      _.incomeStatement(inst, quarterly))
  def balanceSheet(inst: Instrument, quarterly: Boolean = false): Either[BorsaError, Seq[StatementRow]] =
    routed(inst, "balance-sheet", s"balance sheet for ${inst.symbol.value}")(
      _.balanceSheet(inst, quarterly))
  def cashflow(inst: Instrument, quarterly: Boolean = false): Either[BorsaError, Seq[StatementRow]] =
    routed(inst, "cashflow", s"cashflow for ${inst.symbol.value}")(_.cashflow(inst, quarterly))
  def esg(inst: Instrument): Either[BorsaError, EsgScores] =
    routed(inst, "esg", s"esg for ${inst.symbol.value}")(_.esg(inst))
  def news(inst: Instrument, req: NewsRequest = NewsRequest()): Either[BorsaError, Seq[NewsArticle]] =
    routed(inst, "news", s"news for ${inst.symbol.value}")(_.news(inst, req))
  def optionsExpirations(inst: Instrument): Either[BorsaError, Seq[Long]] =
    routed(inst, "options-expirations", s"option expirations for ${inst.symbol.value}")(
      _.optionsExpirations(inst))
  def optionChain(inst: Instrument, expiration: Option[Long] = None): Either[BorsaError, OptionChain] =
    routed(inst, "option-chain", s"option chain for ${inst.symbol.value}")(
      _.optionChain(inst, expiration))
  def holders(inst: Instrument, kind: HolderKind): Either[BorsaError, Seq[HolderRow]] =
    routed(inst, kind.id, s"${kind.id} for ${inst.symbol.value}")(_.holders(inst, kind))
  def calendar(inst: Instrument): Either[BorsaError, CalendarEvents] =
    routed(inst, "calendar", s"calendar for ${inst.symbol.value}")(_.calendar(inst))
  def recommendations(inst: Instrument): Either[BorsaError, Seq[Recommendation]] =
    routed(inst, "recommendations", s"recommendations for ${inst.symbol.value}")(_.recommendations(inst))
  def recommendationsSummary(inst: Instrument): Either[BorsaError, RecommendationSummary] =
    routed(inst, "recommendations-summary", s"recommendation summary for ${inst.symbol.value}")(
      _.recommendationsSummary(inst))
  def priceTarget(inst: Instrument): Either[BorsaError, PriceTarget] =
    routed(inst, "price-target", s"price target for ${inst.symbol.value}")(_.priceTarget(inst))
  def upgradesDowngrades(inst: Instrument): Either[BorsaError, Seq[UpgradeDowngrade]] =
    routed(inst, "upgrades-downgrades", s"upgrades/downgrades for ${inst.symbol.value}")(
      _.upgradesDowngrades(inst))

  /** ST1-ST3 planning + ST4 supervision for a quote stream. The runner
    * starts the per-provider Structured Streaming sessions; tests inject a
    * scripted runner.
    */
  def streamQuotes(
      instruments: Seq[Instrument],
      runner: StreamController.SessionRunner,
      scheduleTick: (Long, () => Unit) => Unit = (_, _) => ()): Either[BorsaError, StreamController.StreamHandle] = {
    val groups = StreamPlanner.planGroups(
      instruments, connectors.map(_.name),
      canStream = n => connectors.find(_.name == n).exists(_.capabilities.contains("stream-quotes")),
      supportsKind = (n, k) => connectors.find(_.name == n).exists(_.supportsKind(k)),
      policy)
    StreamPlanner.checkStrictRejection(groups, instruments,
      anyStreamCapable = connectors.exists(_.capabilities.contains("stream-quotes"))) match {
      case Left(e) => Left(e)
      case Right(()) if groups.forall(_.providers.isEmpty) =>
        Left(graft.core.Errors.collapseStream(Nil, "stream-quotes")) // no eligible providers
      case Right(()) =>
        val allow = groups.flatMap(_.providers).groupBy(_.provider)
          .view.mapValues(_.flatMap(_.allowedSymbols).toSet).toMap
        val names = connectors.map(_.name)
        val supervisor = SupervisorFsm.Supervisor(
          providers = Vector.fill(names.size)(SupervisorFsm.ProviderState.Idle),
          providerAllow = names.map(n => allow.getOrElse(n, Set.empty[String])).toVector,
          providerCanStream = names.map(n =>
            connectors.find(_.name == n).exists(_.capabilities.contains("stream-quotes"))).toVector,
          requiredSymbols = instruments.map(_.symbol.value).toSet,
          capability = "stream-quotes")
        new StreamController.Controller(supervisor, runner, scheduleTick).awaitStartup()
    }
  }
}
