package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of enrichment — the live face of the flagship
  * batch operator (`operators.AsOfJoin.backward`, qi_asof_price): every
  * trade leaving the stream carries the prevailing quote (the most recent
  * quote with `quote.ts <= trade.ts` for the symbol, equal ts matching),
  * optionally bounded by a tolerance window. The operator a live
  * trade-enrichment consumer reaches for first.
  *
  * State is ONE `(ts, value)` struct per symbol — the prevailing quote —
  * expired by a processing-time TTL (the ST8 reaper discipline): bounded
  * regardless of stream length, unlike buffering either side.
  *
  * Ordering contract (the ST8 equivalence discipline): input must be
  * per-symbol event-time-ordered, which is exactly what the monotonic gate
  * emits — compose as `gate → asOfEnrich` (see [[gatedAsOfEnrich]]). Under
  * that contract the stream output EQUALS the batch `AsOfJoin.backward`
  * replay of the same events, property-tested across arbitrary micro-batch
  * boundaries. Within one micro-batch rows are sorted by `(ts, side)` with
  * quotes before trades at equal ts, so batch chunking cannot reorder the
  * carry — the same `__side` trick as the batch union-carry.
  *
  * Like the batch operator, quotes must be unique per (symbol, ts) —
  * pre-aggregate upstream (qi_asof_price uses `max_by(value, arrival)`).
  */
object StreamAsOf {

  /** One tagged event: `isQuote=true` rows update the prevailing quote,
    * `isQuote=false` rows (trades) are emitted enriched. `value` carries
    * the quote price or the trade payload (micros convention).
    */
  final case class AsOfEvent(symbol: String, ts: Long, isQuote: Boolean, value: Long)

  /** An enriched trade: `matchedTs`/`matchedValue` are the prevailing
    * quote, or None when none exists (or it fell outside the tolerance).
    */
  final case class Enriched(
      symbol: String, ts: Long, value: Long,
      matchedTs: Option[Long], matchedValue: Option[Long])

  final case class QuoteState(qts: Long, qval: Long)

  /** Streaming enrichment over a tagged event stream. `tolerance` bounds
    * `trade.ts - quote.ts` (older matches emit None), mirroring the batch
    * operator's parameter. `stateTtlMs = 0` disables the reaper (testing).
    */
  def asOfEnrich(
      events: Dataset[AsOfEvent],
      tolerance: Option[Long] = None,
      stateTtlMs: Long = 24 * 3600 * 1000L): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[QuoteState, Enriched](OutputMode.Append(), timeoutConf)(
        processGroup(tolerance, stateTtlMs))
  }

  /** The per-group kernel — named (not inline) so the TTL arming paths are
    * unit-testable against `TestGroupState` (a TTL-armed streaming query
    * never quiesces under `processAllAvailable`/AvailableNow, so the
    * equivalence specs run with the reaper off and THIS covers the rest).
    */
  private[streaming] def processGroup(
      tolerance: Option[Long], stateTtlMs: Long)(
      symbol: String, rows: Iterator[AsOfEvent],
      state: GroupState[QuoteState]): Iterator[Enriched] = {
    if (state.hasTimedOut) {
      state.remove() // TTL reaper: forget the prevailing quote
      Iterator.empty
    } else {
      var quote = state.getOption
      // (ts, quotes-first): a quote and a trade at the same ts must
      // match regardless of which micro-batch position they hold
      // (!isQuote: false sorts first, so the quote is applied before
      // the trade is emitted — the batch carry's __side=0-first rule)
      val out = rows.toSeq.sortBy(e => (e.ts, !e.isQuote, e.value))
        .iterator.flatMap { e =>
          if (e.isQuote) { quote = Some(QuoteState(e.ts, e.value)); None }
          else {
            val m = quote.filter(q => tolerance.forall(t => e.ts - q.qts <= t))
            Some(Enriched(symbol, e.ts, e.value, m.map(_.qts), m.map(_.qval)))
          }
        }.toVector
      // arm the TTL only when state exists: a trades-only batch for a
      // never-quoted symbol has nothing to expire, and calling
      // setTimeoutDuration on undefined state throws at runtime
      quote.foreach { q =>
        state.update(q)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      }
      out.iterator
    }
  }

  /** The ENFORCED live composition (the `dedupedGate` discipline): ST8
    * monotonic gate first — quotes and trades share ONE gate key (the
    * symbol), so an out-of-order event on EITHER side is dropped before it
    * can corrupt the prevailing-quote state — then the enrichment. This is
    * what establishes [[asOfEnrich]]'s ordering contract in a live wiring;
    * session code should call this instead of composing by convention.
    *
    * `arrivalOf` is the delivery-order sequence the gate replays within a
    * micro-batch (connector feeds use the arrival counter).
    */
  def gatedAsOfEnrich(
      events: Dataset[AsOfEvent],
      arrivalOf: AsOfEvent => Long,
      tolerance: Option[Long] = None,
      stateTtlMs: Long = 24 * 3600 * 1000L): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    asOfEnrich(
      MonotonicGate.streamingGateOf[AsOfEvent](
        events, _.symbol, arrivalOf, _.ts, stateTtlMs),
      tolerance, stateTtlMs)
  }

  /** Batch replay oracle: the SAME semantics via the batch union-carry —
    * the equivalence target for the property spec (ST8 discipline: the
    * stream must be indistinguishable from this replay).
    */
  def batchReplay(
      events: Seq[AsOfEvent],
      spark: org.apache.spark.sql.SparkSession,
      tolerance: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val quotes = events.filter(_.isQuote).map(e => (e.symbol, e.ts, e.value))
      .toDF("symbol", "ts", "qval")
    val trades = events.filterNot(_.isQuote).map(e => (e.symbol, e.ts, e.value))
      .toDF("symbol", "ts", "value")
    graft.operators.AsOfJoin.backward(trades, quotes, Seq("symbol"), "ts", "ts",
      Seq("qval"), tolerance = tolerance, matchedTs = "matched_ts")
  }
}
