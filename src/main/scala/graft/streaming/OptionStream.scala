package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed option-stream data plane for the `stream-options` capability
  * (reference: OptionUpdate stream via borsa-core/src/connector.rs:239-245,
  * planned by borsa/src/router/streaming/planner.rs:317-389; the update
  * type itself comes from the public paft options module).
  *
  * Composition with the shared streaming kernels: sessions subscribe by
  * UNDERLYING (the planner's symbol universe), so the ST9 allow-filter
  * keys on `underlying`; monotonic ordering is per CONTRACT (one options
  * chain carries many contracts per underlying with independent update
  * clocks), so the ST8 gate keys on `contract_symbol`. Both reuse the
  * existing operators by column mapping — no new stateful kernels.
  */
object OptionStream {

  final case class OptionUpdate(
      contractSymbol: String,
      underlying: String,
      ts: Long, // event time, epoch seconds
      arrival: Long, // session arrival order (gate tiebreak/replay key)
      bid: Option[BigDecimal],
      ask: Option[BigDecimal],
      last: Option[BigDecimal],
      openInterest: Option[Long])

  /** ST9 for option feeds: keep only contracts of subscribed underlyings. */
  def allowUnderlyings(df: DataFrame, allowed: Set[String]): DataFrame =
    df.where(col("underlying").isin(allowed.toSeq: _*))

  /** ST8 for option feeds: per-CONTRACT monotonic gate, batch-replay form
    * (the oracle shape of MonotonicGate.batchReplay keyed by contract).
    */
  def batchReplay(df: DataFrame): DataFrame =
    MonotonicGate.batchReplay(df.withColumnRenamed("contractSymbol", "symbol"))
      .withColumnRenamed("symbol", "contractSymbol")

  /** Streaming per-contract gate — the same flatMapGroupsWithState kernel
    * as MonotonicGate.streamingGate, keyed by contract and carrying the
    * FULL typed row through the state function (cheaper than gating a
    * (contract, arrival, ts) projection and re-joining two streams).
    */
  def streamingGate(
      updates: Dataset[OptionUpdate],
      stateTtlMs: Long = 24 * 3600 * 1000L): Dataset[OptionUpdate] = {
    import updates.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates
      .groupByKey(_.contractSymbol)
      .flatMapGroupsWithState[MonotonicGate.GateState, OptionUpdate](
        OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[OptionUpdate],
         state: GroupState[MonotonicGate.GateState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var maxTs = state.getOption.map(_.maxTs).getOrElse(Long.MinValue)
            val out = rows.toSeq.sortBy(_.arrival).filter { u =>
              if (u.ts >= maxTs) { maxTs = math.max(maxTs, u.ts); true }
              else false
            }
            state.update(MonotonicGate.GateState(maxTs))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }
}
