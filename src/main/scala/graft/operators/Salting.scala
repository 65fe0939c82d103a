package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (the 100 TB lever when AQE's runtime skew
  * split isn't available — e.g. aggregations, or joins whose skew AQE can't
  * see at plan time).
  *
  *  - saltedJoin: the skewed (large) side gets a deterministic per-row salt
  *    in [0, k); the small side is exploded k× so every (key, salt) pair
  *    matches. One hot key's partition becomes k partitions.
  *  - saltedAggSum: two-phase aggregation — partial sums on (keys, salt),
  *    final sums on keys. Spark's own partial aggregation usually covers
  *    this; the explicit form handles high-cardinality accumulators
  *    (collect-like or distinct-heavy) where map-side combine is weak.
  *
  * Salts derive from xxhash64 of the full row struct: deterministic under
  * task retry (no rand()), uniform for distinct rows.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets). Hashes the FULL row, so it
    * spreads hot keys whose rows differ in any column (the common skew
    * case: one symbol, many timestamps/payloads). Known limit: a hot key
    * whose rows are BIT-IDENTICAL duplicates all hash to one bucket and
    * still serialize — full-row hashing is the price of retry determinism
    * (a row-local counter would spread them but re-salt differently
    * on task retry, breaking exactly-once sinks). Exact-duplicate-heavy
    * inputs should dedup (pipeline.Dedup) or pre-count before salting —
    * or opt into [[saltColSpread]] where the sink tolerates retry
    * nondeterminism.
    */
  def saltCol(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets.toLong))

  /** [[saltCol]] with a row-local disambiguator mixed in — the OPT-IN form
    * for duplicate-heavy hot keys: bit-identical rows of one key spread
    * evenly over the buckets instead of landing in one. The disambiguator
    * (`monotonically_increasing_id` = partition id << 33 | partition-local
    * row index) is unique per row, so the salt is uniform regardless of
    * row content. The trade, and why this is not the default: a retried
    * task re-enumerates its partition and may salt the same row
    * differently, so downstream exactly-once sinks that key on the salted
    * partition must not be fed from this form — use it for idempotent
    * aggregations ([[saltedAggSum]]'s two-phase sum is one: every row
    * still contributes exactly once to exactly one partial regardless of
    * which salt it drew) and joins materialized atomically.
    */
  def saltColSpread(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*), monotonically_increasing_id()),
      lit(buckets.toLong))

  /** Join `large` (skewed on `key`) with `small`, spreading each key over
    * `buckets` sub-partitions. Result equals the plain join.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner",
      spreadDuplicates: Boolean = false): DataFrame = {
    val salt = if (spreadDuplicates) saltColSpread(large, buckets) else saltCol(large, buckets)
    val saltedLarge = large.withColumn("__salt", salt)
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase skew-safe sum aggregation over possibly-hot group keys. */
  def saltedAggSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int,
      spreadDuplicates: Boolean = false): DataFrame =
    df.withColumn("__salt",
        if (spreadDuplicates) saltColSpread(df, buckets) else saltCol(df, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Skew detection: key values holding at least `thresholdPpm` of the
    * total rows (e.g. 50_000 ppm = any key with ≥5% of the data). ONE
    * aggregation pass over the input — the total is summed from the
    * already-aggregated per-key counts, not a second scan. Returns the hot
    * keys with their counts so a caller can size `buckets` for
    * [[saltedJoin]] or `span` for `AsOfJoin.backwardSalted` from the worst
    * offender. Deterministic — no sampling — because the decision feeds
    * plan construction and a retry must reach the same plan. The share
    * comparison runs in DECIMAL(38,0): Long `n_total * thresholdPpm`
    * silently wraps past ~9.2e12 rows, exactly the scale this detector
    * targets.
    */
  def hotKeys(
      df: DataFrame,
      keys: Seq[String],
      thresholdPpm: Long = 50000L): DataFrame = {
    require(thresholdPpm > 0, s"thresholdPpm must be positive, got $thresholdPpm")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .where(col("n_rows").cast("decimal(38,0)") * 1000000L >=
        col("n_total").cast("decimal(38,0)") * thresholdPpm)
      .select(keys.map(col) :+ col("n_rows"): _*)
  }

  /** [[hotKeys]] plus the per-key timestamp range needed to SIZE the
    * mitigation: `AsOfJoin.auto` divides the worst offender's `(ts_min,
    * ts_max)` spread by its bucket target to pick a salted-carry `span`.
    * Same single-pass, deterministic, DECIMAL-compared detection — the
    * extra min/max aggregates ride the existing exchange for free.
    */
  def hotKeyStats(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      thresholdPpm: Long = 50000L): DataFrame = {
    require(thresholdPpm > 0, s"thresholdPpm must be positive, got $thresholdPpm")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"),
      min(col(tsCol)).as("ts_min"), max(col(tsCol)).as("ts_max"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .where(col("n_rows").cast("decimal(38,0)") * 1000000L >=
        col("n_total").cast("decimal(38,0)") * thresholdPpm)
      .select(keys.map(col) ++ Seq(col("n_rows"), col("ts_min"), col("ts_max")): _*)
  }
}
