package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority merge + dedup kernels (SURVEY §2 M1–M3).
  *
  * Reference semantics (/root/reference/borsa-core/src/timeseries/merge.rs):
  *  - M1/M2 `merge_history` / `merge_candles_by_priority` (merge.rs:28-161):
  *    priority-ordered outer merge of N series keyed by ts; on duplicate ts the
  *    FIRST-appearing (lowest-priority-index) series wins; output sorted by ts.
  *  - M3 `dedup_actions` (merge.rs:173-279): canonical sort by
  *    (ts, kind-rank Dividend<Split<CapitalGain, payload) then keep first of
  *    each full identity.
  *
  * Spark-first design: the reference's BTreeMap insert-if-absent loop becomes
  * `row_number() OVER (PARTITION BY keys ORDER BY priority, tiebreak) = 1`.
  * This is a single hash-partition shuffle on the merge keys — no global
  * sort, no driver-side loop — so N providers × 100 TB merges with the same
  * plan. When one side is small, pre-union `broadcast()` is unnecessary
  * because the merge is a union, not a join.
  */
object Merge {

  /** M1/M2 — first-wins merge of pre-unioned rows carrying a `priority`
    * column. Keeps exactly one row per (keys...), the one with the smallest
    * (priority, tiebreak...).
    */
  def firstWins(
      unioned: DataFrame,
      keys: Seq[String],
      priorityCol: String = "priority",
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val order = (priorityCol +: tiebreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** M1 — merge N candle DataFrames in priority order (index = priority).
    * Duplicate ts across providers → the earliest-listed provider wins
    * (merge.rs:52-75). `close_unadj` is cleared on merged output
    * (merge.rs:93-95).
    */
  def mergeCandlesByPriority(series: Seq[DataFrame], keys: Seq[String] = Seq("symbol", "ts")): DataFrame = {
    require(series.nonEmpty, "mergeCandlesByPriority: no input series")
    val tagged = series.zipWithIndex.map { case (df, i) => df.withColumn("__prio", lit(i)) }
    val merged = firstWins(tagged.reduce(_ unionByName _), keys, "__prio").drop("__prio")
    if (merged.columns.contains("close_unadj"))
      merged.withColumn("close_unadj", lit(null).cast("decimal(38,9)"))
    else merged
  }

  /** Adjusted-flag algebra of M1 (merge.rs:32-37,76-102): result.adjusted =
    * adjusted of the FIRST contributing series AND the AND over all
    * contributing series. Computed over per-series metadata rows
    * (provider, priority, adjusted, contributed).
    */
  def mergedAdjustedFlag(seriesMeta: DataFrame): DataFrame =
    seriesMeta
      .filter(col("contributed"))
      .agg(
        (min_by(col("adjusted"), col("priority")) && bool_and(col("adjusted"))).as("adjusted"))

  /** M3 — canonical action dedup (merge.rs:173-279). Input rows
    * (ts, kind ∈ dividend|split|capital_gain, amount, currency, numerator,
    * denominator); output unique identities sorted by
    * (ts, kind-rank, amount, currency).
    */
  def kindRank(kind: Column): Column =
    when(kind === "dividend", 0).when(kind === "split", 1).otherwise(2)

  /** Dedup KERNEL without the canonical presentation sort — for mid-plan
    * composition (the router's merge consumes the result as a frame that
    * downstream operators re-partition anyway; a global Sort there is pure
    * wasted work). Use [[dedupActions]] when the canonical order itself is
    * the contract (terminal presentation, the M3 oracle query).
    */
  def dedupActionsUnsorted(actions: DataFrame, keys: Seq[String] = Seq.empty): DataFrame = {
    // `symbol` is part of the identity whenever present: without it, a
    // multi-symbol frame would collapse same-valued actions of DIFFERENT
    // instruments into one row (merge.rs:173-279 dedups within one
    // instrument's series; symbol scoping is implicit there).
    val identity = keys ++ Seq("symbol", "ts", "kind", "amount", "currency", "numerator", "denominator")
    val present = identity.distinct.filter(actions.columns.contains)
    actions.dropDuplicates(present)
  }

  /** Canonical ORDER of M3 (merge.rs:173-279): (keys..., symbol, ts,
    * kind-rank, amount, currency). Split from the kernel so plans can
    * compose the dedup without a Sort node.
    */
  def canonicalActionOrder(df: DataFrame, keys: Seq[String] = Seq.empty): DataFrame = {
    val symbolKey =
      if (!keys.contains("symbol") && df.columns.contains("symbol")) Seq(col("symbol"))
      else Seq.empty
    df.orderBy((keys.map(col) ++ symbolKey ++
      Seq(col("ts"), kindRank(col("kind")), col("amount"), col("currency"))): _*)
  }

  def dedupActions(actions: DataFrame, keys: Seq[String] = Seq.empty): DataFrame =
    canonicalActionOrder(dedupActionsUnsorted(actions, keys), keys)
}
