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
    middleware: Boolean = true,
    middlewareConfig: Graft.MiddlewareConfig = Graft.MiddlewareConfig()) {

  val connectors: Seq[Connector] =
    if (!middleware) rawConnectors
    else rawConnectors.map(c => Middleware.buildStack(c,
      cache = middlewareConfig.cache,
      blacklist = middlewareConfig.blacklist,
      quota = middlewareConfig.quota)
      .fold(e => throw new IllegalStateException(e.toString), identity))

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

  /** Q2 composed info with warnings. The fan-out runs inside the MW6
    * internal-origin scope (info.rs:35-37,76-78 — `CallOrigin::scope`):
    * sub-calls hit the same cache but consume NO quota and cannot trip the
    * blacklist breaker.
    */
  def info(inst: Instrument): Either[BorsaError, Report[InfoRouter.Info]] =
    InfoRouter.info(inst,
      () => Middleware.internal("info", "info.quote")(quote(inst)),
      () => Middleware.internal("info", "info.profile")(profile(inst)),
      () => Middleware.internal("info", "info.isin")(isin(inst)))

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
      scheduleTick: (Long, () => Unit) => Unit = (_, _) => ()): Either[BorsaError, StreamController.Handle] =
    streamCapability("stream-quotes", instruments, runner, scheduleTick)

  /** Candle stream façade (planner.rs:173-243): identical planning keyed on
    * `stream-candles`; the session data plane builds update-mode bars with
    * the is_final contract via [[graft.streaming.CandleAggregator]].
    */
  def streamCandles(
      instruments: Seq[Instrument],
      runner: StreamController.SessionRunner,
      scheduleTick: (Long, () => Unit) => Unit = (_, _) => ()): Either[BorsaError, StreamController.Handle] =
    streamCapability("stream-candles", instruments, runner, scheduleTick)

  /** Option stream façade (planner.rs:317-389). */
  def streamOptions(
      instruments: Seq[Instrument],
      runner: StreamController.SessionRunner,
      scheduleTick: (Long, () => Unit) => Unit = (_, _) => ()): Either[BorsaError, StreamController.Handle] =
    streamCapability("stream-options", instruments, runner, scheduleTick)

  /** Shared stream orchestration: ST1 grouping → ST2 strict rejection →
    * ST3 per-symbol primary election + supervisor SHARDING (stream.rs:
    * 127-288) — one FSM per failover chain, provider vectors in CHAIN
    * order (the FSM elects positionally), runner ids translated back to
    * global connector indices. Startup follows stream.rs:290-311: await
    * every chain's initial result; zero successes OR any error → stop all
    * started chains and collapse.
    */
  private def streamCapability(
      capability: String,
      instruments: Seq[Instrument],
      runner: StreamController.SessionRunner,
      scheduleTick: (Long, () => Unit) => Unit): Either[BorsaError, StreamController.Handle] = {
    val names = connectors.map(_.name)
    val groups = StreamPlanner.planGroups(
      instruments, names,
      canStream = n => connectors.find(_.name == n).exists(_.capabilities.contains(capability)),
      supportsKind = (n, k) => connectors.find(_.name == n).exists(_.supportsKind(k)),
      policy)
    StreamPlanner.checkStrictRejection(groups, instruments,
      anyStreamCapable = connectors.exists(_.capabilities.contains(capability))) match {
      case Left(e) => Left(e)
      case Right(()) if groups.forall(_.providers.isEmpty) =>
        Left(graft.core.Errors.collapseStream(Nil, capability)) // no eligible providers
      case Right(()) =>
        val assignments = for {
          group <- groups.filter(_.providers.nonEmpty)
          assignment <- StreamPlanner.assignSupervisors(group, policy)
        } yield (group, assignment)
        val controllers = assignments.zipWithIndex.map { case ((group, assignment), chainIdx) =>
          val planByName = group.providers.map(p => p.provider -> p).toMap
          val chain = assignment.failoverChain.filter(planByName.contains)
          val globalIdx = chain.map(names.indexOf).toVector
          val supervisor = SupervisorFsm.Supervisor(
            providers = Vector.fill(chain.size)(SupervisorFsm.ProviderState.Idle),
            providerAllow = chain.map(n =>
              planByName(n).allowedSymbols & assignment.symbols).toVector,
            providerCanStream = Vector.fill(chain.size)(true),
            requiredSymbols = assignment.symbols,
            capability = capability)
          // chain-scoped runner view (distinct sessions per chain even for
          // a shared provider) + chain-local→global connector id mapping
          val scoped = runner.forChain(chainIdx)
          val chainRunner = new StreamController.SessionRunner {
            def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
              scoped.start(globalIdx(id), symbols)
            def stop(id: Int): Unit = scoped.stop(globalIdx(id))
            override def awaitStopped(): Unit = scoped.awaitStopped()
          }
          new StreamController.Controller(supervisor, chainRunner, scheduleTick)
        }
        val results = controllers.map(_.awaitStartup())
        val errors = results.collect { case Left(e) => e }
        val handles = results.collect { case Right(h) => h }
        if (handles.isEmpty || errors.nonEmpty) {
          handles.foreach(_.stop())
          Left(graft.core.Errors.collapseStream(errors, capability))
        } else Right(new StreamController.CompositeHandle(handles))
    }
  }
}

object Graft {

  /** Middleware layer configuration (None disables that layer; MW5 order
    * cache→blacklist→quota is enforced by the builder).
    */
  final case class MiddlewareConfig(
      cache: Option[Middleware.CacheConfig] = Some(Middleware.CacheConfig()),
      blacklist: Option[Middleware.BlacklistConfig] = Some(Middleware.BlacklistConfig()),
      quota: Option[Middleware.QuotaConfig] = Some(Middleware.QuotaConfig()))

  /** Construct a fully-configured engine from a parsed [[graft.routing.PolicySerde.GraftConfig]]
    * (the JSON config surface) — routing rules, exchange preferences,
    * fetch/history strategies, and middleware budgets all config-driven.
    */
  def fromConfig(
      spark: SparkSession,
      connectors: Seq[Connector],
      cfg: graft.routing.PolicySerde.GraftConfig): Graft =
    new Graft(spark, connectors,
      policy = cfg.routing,
      fetchConfig = cfg.fetch,
      historyConfig = cfg.history,
      exchangePrefs = cfg.exchangePreferences,
      middlewareConfig = cfg.middleware)
}
