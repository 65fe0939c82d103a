package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Currency-uniformity invariants (SURVEY §2 C1–C3, H5 diagnostic).
  *
  * Reference semantics (/root/reference/borsa-core/src/timeseries/util.rs:19-48,
  * merge.rs:54-68): every candle must be single-currency and the whole series
  * must share one currency; violations are data errors. The router's H5
  * diagnostic (/root/reference/borsa/src/router/history.rs:205-274) identifies
  * WHICH provider broke the invariant.
  *
  * Spark-first: the per-candle invariant (C1) is structural in our schema
  * (one `currency` column per row); the series invariant (C2) is a
  * countDistinct aggregate; the enforcing variant uses `raise_error` inside
  * the plan so violations fail the job exactly where the reference aborts.
  */
object Currency {

  /** C2 (diagnostic form) — symbols carrying more than one currency.
    * Empty result ⇔ invariant holds. Also the H5 faulty-provider scan when
    * keyed by (provider) or (symbol, provider).
    */
  def violations(df: DataFrame, keys: Seq[String] = Seq("symbol")): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(col("currency")).as("n_currencies"))
      .filter(col("n_currencies") > 1)
      .orderBy(keys.map(col): _*)

  /** C2 (enforcing form) — passthrough that raises a data error if any key
    * group mixes currencies (util.rs:34-48). The check is a separate
    * aggregate sub-plan; the passthrough is untouched when clean.
    */
  def ensureUniform(df: DataFrame, keys: Seq[String] = Seq("symbol")): DataFrame = {
    val bad = violations(df, keys)
    // lazily evaluated inside the plan: a 1-row guard relation cross-joined
    // in, consumed by a FILTER so column pruning cannot elide the
    // raise_error (a merely-projected side-effect column would be pruned)
    val guard = bad
      .agg(count(lit(1)).as("__bad"))
      .select(when(col("__bad") > 0,
        raise_error(concat(lit("currency invariant violated for "), col("__bad"), lit(" group(s)"))))
        .otherwise(lit(null)).as("__guard"))
    df.crossJoin(broadcast(guard)).where(col("__guard").isNull).drop("__guard")
  }

  /** C3 — strip unadjusted closes (util.rs:8-12). */
  def stripUnadjusted(df: DataFrame): DataFrame =
    if (df.columns.contains("close_unadj"))
      df.withColumn("close_unadj", lit(null).cast("decimal(38,9)"))
    else df
}
