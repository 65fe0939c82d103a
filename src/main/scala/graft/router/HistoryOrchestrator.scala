package graft.router

import java.util.concurrent.TimeoutException
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.connector.Connector
import graft.core.Errors
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy

/** The flagship §3.1 history pipeline end-to-end (H1–H8 over the connector
  * layer): eligibility → per-provider interval negotiation (R6) → Deep
  * parallel / Fallback sequential fan-out (H1/H2) → per-provider resample
  * plan (H3) → adjusted ordering/filter (H4) → first-wins merge + currency
  * diagnosis + attribution (M1/H5/H6) → final resample (H7) → error
  * collapse (history.rs:155-176).
  *
  * Connector results (record-level) are lifted into DataFrames so the merge
  * is the same Catalyst plan the bulk/scan path uses — single-instrument
  * history is just the multi-symbol pipeline with one symbol.
  */
object HistoryOrchestrator {

  sealed trait MergeStrategy
  object MergeStrategy {
    /** H1 Deep: fan out to ALL eligible providers concurrently (config.rs:24-32). */
    case object Deep extends MergeStrategy
    /** H2 Fallback: first NON-EMPTY result wins; empty-but-OK continues. */
    case object Fallback extends MergeStrategy
  }

  final case class Config(
      strategy: MergeStrategy = MergeStrategy.Deep,
      preferAdjusted: Boolean = true,
      providerTimeout: FiniteDuration = 5.seconds,
      finalResample: HistoryRouter.FinalResample = HistoryRouter.FinalResample.None,
      /** Optional request-level deadline bounding the WHOLE provider
        * fan-out — per-instrument for [[history]], across the concurrent
        * per-instrument fan-out for [[download]] (config.rs:140-142,162;
        * applied at history.rs:126-153 / download.rs:171-186). `None`
        * leaves the request bounded only by per-call provider timeouts.
        */
      requestTimeout: Option[FiniteDuration] = None)

  private lazy val ec = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-history"); t.setDaemon(true); t
    }))

  /** Time budget for one blocking await under an optional shared deadline:
    * the sooner of the stage's own bound and what the deadline has left.
    */
  private def budget(deadline: Option[Deadline], stageBound: FiniteDuration): FiniteDuration =
    deadline match {
      case None    => stageBound
      case Some(d) =>
        val left = d.timeLeft
        if (left <= Duration.Zero) Duration.Zero
        else if (left < stageBound) left else stageBound
    }

  val candleSchema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("ts", LongType),
    StructField("open", DecimalType(38, 9)), StructField("high", DecimalType(38, 9)),
    StructField("low", DecimalType(38, 9)), StructField("close", DecimalType(38, 9)),
    StructField("close_unadj", DecimalType(38, 9)), StructField("volume", LongType),
    StructField("currency", StringType)))

  def candlesToDf(spark: SparkSession, candles: Seq[Candle]): DataFrame = {
    val rows = candles.map { c =>
      Row(c.symbol, c.ts, c.open.bigDecimal, c.high.bigDecimal, c.low.bigDecimal,
        c.close.bigDecimal, c.closeUnadj.map(_.bigDecimal).orNull,
        c.volume.map(Long.box).orNull, c.currency)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), candleSchema)
  }

  val actionSchema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("ts", LongType),
    StructField("kind", StringType), StructField("amount", DecimalType(38, 9)),
    StructField("currency", StringType), StructField("numerator", LongType),
    StructField("denominator", LongType)))

  def actionsToDf(spark: SparkSession, actions: Seq[Action]): DataFrame = {
    val rows = actions.map { a =>
      Row(a.symbol, a.ts, a.kind, a.amount.map(_.bigDecimal).orNull,
        a.currency.orNull, a.numerator.map(Long.box).orNull,
        a.denominator.map(Long.box).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), actionSchema)
  }

  /** Range XOR period validation (download.rs:10-27,130-213). */
  def validateRequest(req: HistoryRequest): Either[BorsaError, HistoryRequest] = {
    val hasRange = req.startEpoch.isDefined || req.endEpoch.isDefined
    (req.period, hasRange) match {
      case (Some(_), true)  => Left(BorsaError.InvalidArg("period and start/end are mutually exclusive"))
      case (None, false)    => Left(BorsaError.InvalidArg("history request needs a period or a [start,end) range"))
      case _ =>
        (req.startEpoch, req.endEpoch) match {
          case (Some(s), Some(e)) if s >= e => Left(BorsaError.InvalidArg("start must precede end"))
          case _ => Right(req)
        }
    }
  }

  /** Plan stage: eligible connectors (policy order ∩ kind ∩ capability) with
    * their negotiated effective request + resample plan
    * (history.rs:388-443).
    */
  def planProviders(
      inst: Instrument,
      req: HistoryRequest,
      connectors: Seq[Connector],
      policy: Policy.ProviderPolicy): Seq[(Connector, HistoryRequest, Option[HistoryRouter.ResamplePlan])] = {
    val ctx = Policy.Context(Some(inst.symbol), Some(inst.kind), inst.exchange)
    val ordered = policy.orderedForContext(ctx, connectors.map(_.name))
      .flatMap(n => connectors.find(_.name == n))
      .filter(c => c.supportsKind(inst.kind) && c.capabilities.contains("history"))
    ordered.flatMap { c =>
      HistoryRouter.chooseEffectiveInterval(c.supportedIntervals, req.interval) match {
        case Right((eff, plan)) => Some((c, req.copy(interval = eff), plan))
        case Left(_)            => None // provider can't serve this cadence at all
      }
    }
  }

  final case class HistoryResult(
      candles: DataFrame,
      attribution: DataFrame,
      adjusted: Boolean,
      meta: Option[HistoryMeta],
      warnings: Seq[BorsaError],
      /** Merged, deduped corporate actions. Like every DataFrame in this
        * result the row order is UNSPECIFIED (frames compose into further
        * plans; a baked-in global sort would be wasted work mid-plan) —
        * apply [[graft.timeseries.Merge.canonicalActionOrder]] when
        * presenting in the reference's canonical (ts, kind, payload) order.
        */
      actions: Option[DataFrame] = None,
      /** The surviving per-provider control-plane inputs — kept so the lazy
        * currency guard's failure can be mapped to the reference's typed
        * error at ACTION time (see [[collect]]).
        */
      providers: Seq[HistoryRouter.ProviderHistory] = Seq.empty) {

    /** Run a Spark action over this result with H5 failure-path diagnosis:
      * a currency-guard abort is translated to
      * `Connector(deviatingProvider, InconsistentCurrencyData)`
      * (history.rs:205-274), everything else passes through.
      */
    def collect[T](action: => T): Either[BorsaError, T] =
      HistoryRouter.diagnosed(providers)(action)
  }

  /** Per-instrument CONTROL plane (driver-side, record-level): plan → H1/H2
    * fan-out → H3 collect successes → H4 order/filter. No Spark action runs
    * here; the returned ProviderHistory frames are lazy plans. Shared by
    * [[history]] (one instrument) and [[download]] (one data plane over all
    * instruments).
    */
  private def fetchOrdered(
      spark: SparkSession,
      inst: Instrument,
      req: HistoryRequest,
      connectors: Seq[Connector],
      policy: Policy.ProviderPolicy,
      config: Config,
      deadline: Option[Deadline]): Either[BorsaError, (Seq[HistoryRouter.ProviderHistory], Seq[BorsaError])] = {
    val planned = planProviders(inst, req, connectors, policy)
    if (planned.isEmpty) return Left(BorsaError.Unsupported("history"))

    // H1/H2 fan-out, bounded by the shared request deadline when one is set
    // (history.rs:126-153: deadline elapse → RequestTimeout for the whole
    // request, not a per-provider warning)
    type Fetched = (Int, Connector, Option[HistoryRouter.ResamplePlan], Either[BorsaError, HistoryResponse])
    val fetched: Seq[Fetched] = config.strategy match {
      case MergeStrategy.Deep =>
        // MW6: this fan-out may itself run on a pooled thread (download's
        // per-instrument futures) whose InheritableThreadLocal default can
        // be stale — capture the CALLER's scope and re-establish it inside
        // each future, exactly like Fetch.latencyRace
        val origin = graft.connector.Middleware.currentOrigin.value
        val futures = planned.zipWithIndex.map { case ((c, r, plan), i) =>
          Future(graft.connector.Middleware.currentOrigin.withValue(origin)(
            (i, c, plan, Fetch.withTimeout(c.name, "history", config.providerTimeout)(
              c.history(inst, r)))))(ec)
        }
        try Await.result(Future.sequence(futures)(implicitly, ec),
          budget(deadline, config.providerTimeout + 2.second))
        catch {
          case _: TimeoutException => return Left(BorsaError.RequestTimeout("history"))
        }
      case MergeStrategy.Fallback =>
        var acc = List.empty[Fetched]
        var done = false
        planned.zipWithIndex.foreach { case ((c, r, plan), i) =>
          if (!done) {
            if (deadline.exists(_.isOverdue()))
              return Left(BorsaError.RequestTimeout("history"))
            val res = Fetch.withTimeout(c.name, "history",
              budget(deadline, config.providerTimeout))(c.history(inst, r))
            acc ::= ((i, c, plan, res))
            if (res.exists(_.candles.nonEmpty)) done = true // first NON-EMPTY wins
          }
        }
        acc.reverse
    }

    // H3 collect successes: non-empty OKs; NotFound/empty dropped silently,
    // other errors tagged with the connector (history.rs:521-576)
    val successes = fetched.collect {
      case (i, c, plan, Right(resp)) if resp.candles.nonEmpty =>
        HistoryRouter.ProviderHistory(c.name, i, resp.adjusted, resp.meta, plan,
          // request flags (keepna/autoAdjust/prepost) interpret each
          // provider frame BEFORE its resample plan — raw-vs-adjusted
          // selection must happen on the provider cadence
          graft.timeseries.Flags.applyRequestFlags(candlesToDf(spark, resp.candles), req),
          actions = if (req.actions && resp.actions.nonEmpty)
            Some(actionsToDf(spark, resp.actions)) else None)
    }
    val errors = fetched.collect {
      case (_, c, _, Left(e)) if !e.isInstanceOf[BorsaError.NotFound] =>
        e match {
          case t: BorsaError.ProviderTimeout => t
          case tagged: BorsaError.Connector  => tagged
          case other                         => BorsaError.Connector(c.name, other)
        }
    }

    if (successes.isEmpty) {
      // all providers NotFound or OK-but-empty → NotFound, not Unsupported
      // (history.rs:526-535 finalize: empty results with no recorded errors)
      if (errors.isEmpty)
        return Left(BorsaError.NotFound(s"history for ${inst.symbol.value}"))
      return Left(Errors.collapse(errors, "history",
        Some(s"history for ${inst.symbol.value}")))
    }

    Right((HistoryRouter.orderAndFilter(successes, config.preferAdjusted), errors))
  }

  private def adjustedOf(ordered: Seq[HistoryRouter.ProviderHistory]): Boolean =
    HistoryRouter.mergedAdjusted(ordered)

  private def metaOf(ordered: Seq[HistoryRouter.ProviderHistory]): Option[HistoryMeta] =
    HistoryRouter.mergedMeta(ordered)

  /** Execute the full pipeline for one instrument. */
  def history(
      spark: SparkSession,
      inst: Instrument,
      req: HistoryRequest,
      connectors: Seq[Connector],
      policy: Policy.ProviderPolicy = Policy.ProviderPolicy(),
      config: Config = Config()): Either[BorsaError, HistoryResult] = {
    validateRequest(req) match {
      case Left(e) => return Left(e)
      case Right(_) => ()
    }
    val deadline = config.requestTimeout.map(Deadline.now + _)
    fetchOrdered(spark, inst, req, connectors, policy, config, deadline).flatMap {
      case (ordered, errors) =>
        // H4 → M1/H5/H6 → H7
        HistoryRouter.merge(ordered).map { m =>
          HistoryResult(
            HistoryRouter.applyFinalResample(m.candles, config.finalResample, m.meta),
            m.attribution, m.adjusted, m.meta,
            warnings = errors.filter(_.isActionable),
            actions = m.actions,
            providers = ordered)
        }
    }
  }

  /** H8 bulk download across instruments as ONE data plane: the control
    * plane (plan/fetch/order) stays per-instrument — H4 adjusted filtering
    * and provider ranking are instrument-local decisions — but every
    * surviving provider frame is symbol-tagged already, so ALL of them feed
    * a shared grouped merge ([[HistoryRouter.mergeGrouped]]): one
    * first-wins window for the multi-provider instruments, a guard-free
    * short-circuit branch preserving close_unadj for single-provider
    * instruments, one attribution pass over the union. Priorities are
    * per-instrument ranks; the merge key (symbol, ts) means ranks only
    * ever compete within their own instrument. Per-instrument failures —
    * fetch errors AND currency violations — become warnings, partial
    * success succeeds (download.rs:130-213); merged actions ARE
    * propagated.
    *
    * The final resample groups instruments by their merged meta (each
    * instrument's bucket alignment follows its own providers' timezone) —
    * one resample branch per distinct meta, one branch in the common case.
    */
  def download(
      spark: SparkSession,
      instruments: Seq[Instrument],
      req: HistoryRequest,
      connectors: Seq[Connector],
      policy: Policy.ProviderPolicy = Policy.ProviderPolicy(),
      config: Config = Config()): Either[BorsaError, HistoryResult] = {
    val distinctSyms = instruments.map(_.symbol.value)
    require(distinctSyms.distinct.size == distinctSyms.size,
      "duplicate instrument keys in download request") // download.rs:10-27
    validateRequest(req) match {
      case Left(e) => return Left(e)
      case Right(_) => ()
    }
    // Concurrent per-instrument fan-out under ONE shared deadline
    // (download.rs:130-213): each instrument's control-plane fetch runs as
    // its own task on the history executor, so N instruments × a slow
    // provider cost ~one provider timeout of wall-clock, not N×. Deadline
    // elapse fails the WHOLE download with RequestTimeout (download.rs
    // "Returns an error only if ... an overall request-level timeout
    // elapses"); per-instrument failures stay warnings.
    val deadline = config.requestTimeout.map(Deadline.now + _)
    val origin = graft.connector.Middleware.currentOrigin.value // MW6 scope capture
    val futures = instruments.map { i =>
      i -> Future(graft.connector.Middleware.currentOrigin.withValue(origin)(
        fetchOrdered(spark, i, req, connectors, policy, config, deadline)))(ec)
    }
    // without a deadline each fetch is already bounded by per-call provider
    // timeouts (Deep await ≤ providerTimeout+2s; Fallback ≤ N providers ×
    // providerTimeout), so the await bound is that worst case plus slack
    val fetchBound =
      (config.providerTimeout + 2.seconds) * math.max(1L, connectors.size.toLong)
    val per = futures.map { case (i, f) =>
      try i -> Await.result(f, budget(deadline, fetchBound))
      catch {
        case _: TimeoutException =>
          return Left(BorsaError.RequestTimeout("download"))
      }
    }
    // an INNER RequestTimeout can only come from the shared deadline (it
    // is the sole source of a deadline in fetchOrdered), and it races the
    // outer await for the same instant — normalize both outcomes to the
    // documented whole-request RequestTimeout instead of letting the race
    // pick between a warning, AllProvidersFailed, and RequestTimeout
    if (per.exists {
      case (_, Left(_: BorsaError.RequestTimeout)) => true
      case _                                       => false
    }) return Left(BorsaError.RequestTimeout("download"))
    val oks = per.collect { case (i, Right((ordered, errs))) => (i, ordered, errs) }
    val failWarnings = per.collect { case (i, Left(e)) =>
      BorsaError.Connector(i.symbol.value, e) }
    if (oks.isEmpty) return Left(Errors.collapse(failWarnings, "download", None))

    // ONE grouped merge plan across all instruments (per-instrument
    // semantics: single-source short-circuit, per-symbol currency
    // isolation)
    val allProviders = oks.flatMap { case (_, ordered, _) => ordered }
    HistoryRouter.mergeGrouped(oks.map(_._2)).map { case (m, currencyWarnings) =>
      // a currency-violating instrument contributes NOTHING — not rows (the
      // merge dropped them), and not its adjusted flag, meta, or a
      // final-resample branch: same treatment as a fetch-failed instrument
      val violSyms: Set[String] =
        currencyWarnings.collect { case BorsaError.Connector(sym, _) => sym }.toSet
      val contributing = oks.filterNot { case (i, _, _) => violSyms(i.symbol.value) }
      val metaGroups: Seq[(Option[HistoryMeta], Seq[String])] =
        contributing.groupBy { case (_, ordered, _) => metaOf(ordered) }
          .view.mapValues(_.map(_._1.symbol.value)).toSeq
      val finalCandles = (config.finalResample, metaGroups) match {
        case (HistoryRouter.FinalResample.None, _) => m.candles
        case (_, Seq()) => m.candles // every instrument dropped: empty frame
        case (mode, Seq((onlyMeta, _))) =>
          HistoryRouter.applyFinalResample(m.candles, mode, onlyMeta)
        case (mode, groups) =>
          // one resample branch per distinct meta: persist the merged frame
          // first so each branch re-reads the cache instead of recomputing
          // the whole union+merge per branch (same bounded lifecycle as the
          // AutoDaily cache — LRU-evictable, ContextCleaner-reclaimed)
          val cached = m.candles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          groups.map { case (meta, syms) =>
            HistoryRouter.applyFinalResample(
              cached.filter(col("symbol").isin(syms: _*)), mode, meta)
          }.reduce(_ unionByName _)
      }
      HistoryResult(
        finalCandles,
        m.attribution,
        contributing.forall { case (_, ordered, _) => adjustedOf(ordered) },
        contributing.flatMap { case (_, ordered, _) => metaOf(ordered) }.headOption,
        oks.flatMap(_._3.filter(_.isActionable)) ++ failWarnings ++ currencyWarnings,
        actions = m.actions,
        providers = allProviders)
    }
  }
}
