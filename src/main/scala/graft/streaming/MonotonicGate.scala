package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST8 per-symbol monotonic timestamp gate (reference:
  * borsa/src/router/streaming/filters.rs:24-74) + ST9 allow-set filter +
  * ST10 fan-in union.
  *
  * Contract (filters.rs): drop updates with ts < max ts seen so far for the
  * symbol; EQUAL ts is allowed through; gate state expires after a TTL
  * (reaper: 24 h TTL / 15 m sweep → here a state timeout).
  *
  * Two implementations that must agree (and are property-tested against
  * each other):
  *  - batch replay: running-max window over arrival order (the oracle form,
  *    QI-ST8)
  *  - streaming: flatMapGroupsWithState keyed by symbol holding maxTs, with
  *    ProcessingTimeTimeout as the TTL reaper
  */
object MonotonicGate {

  final case class Update(symbol: String, arrival: Long, ts: Long)
  final case class GateState(maxTs: Long)

  /** Batch replay of the gate: keep rows whose ts >= running max of prior
    * (by arrival) rows of the same symbol.
    */
  def batchReplay(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("arrival")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev_max", max(col("ts")).over(w))
      .where(col("__prev_max").isNull || col("ts") >= col("__prev_max"))
      .drop("__prev_max")
  }

  /** Streaming gate. Input must be a streaming Dataset[Update]; each
    * micro-batch's rows for a symbol are processed in arrival order.
    * State TTL ≈ the reference's 24 h reaper (config flag default on,
    * borsa-types/src/config.rs:145-149).
    */
  def streamingGate(
      updates: Dataset[Update],
      stateTtlMs: Long = 24 * 3600 * 1000L): Dataset[Update] = {
    import updates.sparkSession.implicits._
    streamingGateOf[Update](updates, _.symbol, _.arrival, _.ts, stateTtlMs)
  }

  /** The gate generalized over the row type (same contract, same state):
    * lets richer event shapes — e.g. `StreamAsOf.AsOfEvent`, which carries
    * a side tag and payload the `Update` shape can't hold — pass through
    * the IDENTICAL per-symbol monotonic filter before their own stateful
    * stage, instead of re-implementing the gate per shape.
    */
  def streamingGateOf[T](
      updates: Dataset[T],
      symbolOf: T => String,
      arrivalOf: T => Long,
      tsOf: T => Long,
      stateTtlMs: Long = 24 * 3600 * 1000L)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import updates.sparkSession.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout // stateTtlMs=0 → no reaper (testing)
    updates
      .groupByKey(symbolOf)
      .flatMapGroupsWithState[GateState, T](OutputMode.Append(), timeoutConf) {
        (symbol: String, rows: Iterator[T], state: GroupState[GateState]) =>
          if (state.hasTimedOut) {
            state.remove() // TTL reaper: forget the per-symbol watermark
            Iterator.empty
          } else {
            var maxTs = state.getOption.map(_.maxTs).getOrElse(Long.MinValue)
            val out = rows.toSeq.sortBy(arrivalOf).filter { u =>
              if (tsOf(u) >= maxTs) { maxTs = math.max(maxTs, tsOf(u)); true }
              else false
            }
            state.update(GateState(maxTs))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }

  /** In-memory reference model of the gate (for property tests and for the
    * session layer): processes updates one by one, per-symbol max, equal
    * allowed. Mirror of filters.rs:44-74.
    */
  def referenceModel(updates: Seq[Update]): Seq[Update] = {
    val maxSeen = scala.collection.mutable.Map.empty[String, Long]
    updates.filter { u =>
      maxSeen.get(u.symbol) match {
        case Some(m) if u.ts < m => false
        case _ => maxSeen(u.symbol) = math.max(u.ts, maxSeen.getOrElse(u.symbol, Long.MinValue)); true
      }
    }
  }

  /** ST9 unassigned-symbol filter (session.rs:63-68). */
  def allowSetFilter(df: DataFrame, allowed: Set[String]): DataFrame =
    df.where(col("symbol").isin(allowed.toSeq: _*))

  /** ST10 fan-in multiplex: union of session streams into one flow
    * (stream.rs:56-58) — backpressure is native to Spark micro-batching.
    */
  def multiplex(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_ unionByName _)
}
