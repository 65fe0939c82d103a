package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Model.HistoryRequest

/** History-request flag semantics (SURVEY §2 H-flags; reference:
  * the router preserves `prepost`/`auto_adjust`/`keepna` through the
  * per-provider interval rewrite — /root/reference/borsa/src/router/
  * history.rs:417-443 — and the provider adapter interprets them,
  * borsa-yfinance/src/lib.rs:247-262). This is the engine-side
  * interpretation applied to each provider's candle frame before its
  * resample plan:
  *
  *  - keepna=false (default): rows with a null value column are dropped
  *    (the yfinance "dropna" behavior); keepna=true retains them.
  *  - autoAdjust=false: raw-close selection — `close` takes the
  *    provider's raw `close_unadj` provenance when present
  *    (util.rs:8-12 is the inverse strip applied on merge/resample).
  *  - prepost=false: pre/post-market rows are dropped when the provider
  *    marks sessions (an `is_regular` boolean column); providers that
  *    never mark sessions pass through, matching the reference where
  *    prepost filtering happens inside the provider.
  *
  * All three are narrow row-level filters/projections — they ride inside
  * whole-stage codegen ahead of the resample aggregation, so the flags
  * cost nothing at scale and the filters are pushed toward the scan.
  */
object Flags {

  /** Drop rows where any of `cols` (those present) is null. */
  def dropNa(df: DataFrame, cols: Seq[String] = Seq("open", "high", "low", "close")): DataFrame =
    cols.filter(df.columns.contains) match {
      case Nil => df
      case cs  => df.filter(cs.map(col(_).isNotNull).reduce(_ && _))
    }

  /** Raw-close selection for autoAdjust=false. */
  def selectRawClose(df: DataFrame): DataFrame =
    if (df.columns.contains("close_unadj"))
      df.withColumn("close", coalesce(col("close_unadj"), col("close")))
    else df

  /** Apply all request flags to one provider's candle frame. */
  def applyRequestFlags(df: DataFrame, req: HistoryRequest): DataFrame = {
    val afterNa  = if (req.keepna) df else dropNa(df)
    val afterAdj = if (req.autoAdjust) afterNa else selectRawClose(afterNa)
    if (req.prepost || !afterAdj.columns.contains("is_regular")) afterAdj
    else afterAdj.filter(col("is_regular"))
  }
}
