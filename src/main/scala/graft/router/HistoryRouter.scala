package graft.router

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.timeseries.{Attribution, Currency, Merge, Resample}

/** History orchestration (SURVEY §3.1, operators R6 + H1–H8).
  *
  * Control plane (interval negotiation, strategy dispatch, adjusted
  * preference) is pure Scala; the data plane (per-provider resample →
  * priority merge → attribution → final resample) is ONE Catalyst plan:
  * union → row_number dedup → aggregation. Candles per provider arrive as
  * DataFrames with columns (symbol, ts, open, high, low, close,
  * close_unadj, volume, currency) — ts in epoch seconds.
  */
object HistoryRouter {

  /** R6 resample plan (history.rs:23-27). */
  sealed trait ResamplePlan
  object ResamplePlan {
    final case class Minutes(m: Long) extends ResamplePlan
    case object Daily extends ResamplePlan
    case object Weekly extends ResamplePlan
  }

  /** R6 `choose_effective_interval` (history.rs:38-123): exact support →
    * passthrough; intraday → largest supported divisor + minute
    * re-aggregation; D1 → native else coarsest intraday + daily resample;
    * W1 → native else daily else intraday + weekly resample; other
    * calendar intervals pass through.
    */
  def chooseEffectiveInterval(
      supported: Seq[Interval],
      requested: Interval): Either[BorsaError, (Interval, Option[ResamplePlan])] = {
    if (supported.contains(requested)) return Right((requested, None))
    requested.minutes match {
      case Some(reqMin) =>
        val best = supported
          .flatMap(s => s.minutes.map(m => (s, m)))
          .filter { case (_, m) => m <= reqMin && reqMin % m == 0 }
          .sortBy(-_._2)
          .headOption
        best match {
          case Some((eff, _)) => Right((eff, Some(ResamplePlan.Minutes(reqMin))))
          case None => Left(BorsaError.Unsupported("history interval (intraday too fine for provider)"))
        }
      case None => requested match {
        case Interval.D1 =>
          coarsestIntraday(supported) match {
            case Some(eff) => Right((eff, Some(ResamplePlan.Daily)))
            case None => Left(BorsaError.Unsupported("history interval (daily requires daily or intraday)"))
          }
        case Interval.W1 =>
          if (supported.contains(Interval.D1)) Right((Interval.D1, Some(ResamplePlan.Weekly)))
          else coarsestIntraday(supported) match {
            case Some(eff) => Right((eff, Some(ResamplePlan.Weekly)))
            case None => Left(BorsaError.Unsupported("history interval (weekly requires weekly/daily/intraday)"))
          }
        case other => Right((other, None))
      }
    }
  }

  private def coarsestIntraday(supported: Seq[Interval]): Option[Interval] =
    supported.flatMap(s => s.minutes.map(m => (s, m))).sortBy(-_._2).headOption.map(_._1)

  /** One provider's (already fetched) contribution. */
  final case class ProviderHistory(
      provider: String,
      priority: Int,
      adjusted: Boolean,
      meta: Option[HistoryMeta],
      plan: Option[ResamplePlan],
      candles: DataFrame,
      actions: Option[DataFrame] = None)

  /** H3 — apply each provider's resample plan with its own meta
    * (history.rs:521-576). NOTE: candle-shaped resample (open of earliest,
    * close of latest) — not the tick kernel.
    */
  def applyPlan(ph: ProviderHistory): DataFrame = {
    val secs = col("ts")
    ph.plan match {
      case None => ph.candles
      case Some(plan) =>
        val bucket = plan match {
          case ResamplePlan.Minutes(m) => Resample.minuteBucket(secs, m.toInt)
          case ResamplePlan.Daily =>
            (ph.meta.flatMap(_.utcOffsetSeconds)) match {
              case Some(off) => Resample.dailyBucket(secs + off) - off
              case None      => Resample.dailyBucket(secs)
            }
          case ResamplePlan.Weekly => Resample.weeklyBucket(secs)
        }
        // currency rides along as a group key: post-C2 it is functionally
        // dependent on symbol, so this adds no groups and no extra shuffle
        val keys =
          if (ph.candles.columns.contains("currency")) Seq("symbol", "currency")
          else Seq("symbol")
        Resample.resampleCandles(ph.candles, bucket, keys)
          .withColumnRenamed("bucket_ts", "ts")
    }
  }

  /** H4 `order_results` / `filter_adjustedness` (history.rs:578-586,188-203):
    * prefer-adjusted → only adjusted results when any exist, ordered by
    * (!adjusted, original priority); else keep only results matching the
    * top result's adjusted flag.
    */
  def orderAndFilter(results: Seq[ProviderHistory], preferAdjusted: Boolean): Seq[ProviderHistory] =
    if (results.isEmpty) results
    else if (preferAdjusted) {
      val ordered = results.sortBy(r => (!r.adjusted, r.priority))
      if (ordered.exists(_.adjusted)) ordered.filter(_.adjusted) else ordered
    } else {
      val top = results.minBy(_.priority)
      results.sortBy(_.priority).filter(_.adjusted == top.adjusted)
    }

  /** Merged result: candles + deduped actions + flags + attribution. */
  final case class MergedHistory(
      candles: DataFrame,
      attribution: DataFrame,
      adjusted: Boolean,
      meta: Option[HistoryMeta],
      actions: Option[DataFrame] = None)

  /** H5+M1+H6 — the one-logical-plan merge: union with priority →
    * first-wins on (symbol, ts) → close_unadj cleared; mixed currency →
    * per-provider diagnostic (who broke the invariant); attribution spans
    * from the winning rows.
    */
  def merge(results: Seq[ProviderHistory]): Either[BorsaError, MergedHistory] = {
    require(results.nonEmpty, "merge of zero histories")
    val tagged = results.map { r =>
      applyPlan(r)
        .withColumn("__prio", lit(r.priority))
        .withColumn("provider", lit(r.provider))
    }
    val unioned = tagged.reduce(_ unionByName _)

    // H5 currency diagnostic (history.rs:205-274): providers mixing
    // currencies within a symbol, checked BEFORE the merge hides rows.
    val bad = Currency.violations(unioned, Seq("provider", "symbol")).limit(1).collect()
    if (bad.nonEmpty)
      return Left(BorsaError.Connector(bad.head.getString(0), BorsaError.InconsistentCurrencyData))
    val crossBad = Currency.violations(unioned, Seq("symbol")).limit(1).collect()
    if (crossBad.nonEmpty) {
      // deviating provider: first (by priority) whose currency differs from
      // the reference (top-priority) provider's currency
      val ref = unioned.where(col("__prio") === results.map(_.priority).min)
        .select("currency").limit(1).collect()(0).getString(0)
      val deviating = unioned.where(col("currency") =!= ref)
        .orderBy("__prio").select("provider").limit(1).collect()(0).getString(0)
      return Left(BorsaError.Connector(deviating, BorsaError.InconsistentCurrencyData))
    }

    val merged = Merge.firstWins(unioned, Seq("symbol", "ts"), "__prio")
      .withColumn("close_unadj", lit(null).cast("decimal(38,9)")) // merge.rs:93-95
    val attribution = Attribution.spans(merged, Seq("symbol"), "ts")
    val candles = merged.drop("__prio")

    // adjusted flag algebra (merge.rs:32-37,76-102): first contributor AND
    // all contributors; meta = first non-None by priority
    val adjusted = results.minBy(_.priority).adjusted && results.forall(_.adjusted)
    val meta = results.sortBy(_.priority).flatMap(_.meta).headOption

    // M1 action handling (merge.rs:104-109): concatenate all contributors'
    // actions, then M3 canonical dedup
    val actionFrames = results.sortBy(_.priority).flatMap(_.actions)
    val mergedActions =
      if (actionFrames.isEmpty) None
      else Some(graft.timeseries.Merge.dedupActions(actionFrames.reduce(_ unionByName _)))

    Right(MergedHistory(candles.drop("provider"), attribution, adjusted, meta, mergedActions))
  }

  /** H7 `apply_final_resample` (history.rs:636-664): forced daily/weekly, or
    * auto-daily when the series is subdaily; clears close_unadj whenever a
    * resample ran.
    */
  sealed trait FinalResample
  object FinalResample {
    case object None extends FinalResample
    case object Daily extends FinalResample
    case object Weekly extends FinalResample
    case object AutoDaily extends FinalResample
  }

  def applyFinalResample(merged: DataFrame, mode: FinalResample): DataFrame = {
    def run(bucket: org.apache.spark.sql.Column) =
      Resample.resampleCandles(merged, bucket).withColumnRenamed("bucket_ts", "ts")
    mode match {
      case FinalResample.None   => merged
      case FinalResample.Daily  => run(Resample.dailyBucket(col("ts")))
      case FinalResample.Weekly => run(Resample.weeklyBucket(col("ts")))
      case FinalResample.AutoDaily =>
        // I2 on the merged series: resample only if subdaily
        val deltas = graft.timeseries.Infer.isSubdaily(
          merged.withColumn("secs", col("ts")), tiebreak = Seq("ts"))
        val subdaily = deltas.where(col("subdaily")).limit(1).collect().nonEmpty
        if (subdaily) run(Resample.dailyBucket(col("ts"))) else merged
    }
  }

  /** H8 bulk download: the entire pipeline already keys by `symbol`, so a
    * multi-instrument download IS the same plan on a union of inputs —
    * Spark collapses "bulk" into groupBy(symbol, bucket). Partial failures
    * surface as warnings (download.rs:130-213), not aborts.
    */
  def download(
      perInstrument: Seq[(String, Either[BorsaError, Seq[ProviderHistory]])]): (Seq[(String, MergedHistory)], Seq[BorsaError]) = {
    val (oks, errs) = perInstrument.partition(_._2.isRight)
    val merged = oks.flatMap { case (sym, Right(results)) =>
      if (results.isEmpty) None
      else merge(results).toOption.map(sym -> _)
    }
    val warnings = errs.collect { case (sym, Left(e)) => BorsaError.Connector(sym, e) }
    (merged, warnings)
  }
}
