package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-inference kernels (SURVEY §2 I1/I2).
  *
  * Reference semantics (/root/reference/borsa-core/src/timeseries/infer.rs):
  *  - I1 `estimate_step_seconds` (infer.rs:51-113): sort by ts; take positive
  *    adjacent deltas; return the UNIQUE mode; if the mode count ties across
  *    several deltas, return the LOWER MEDIAN of the delta multiset; fewer
  *    than 2 distinct timestamps → NULL.
  *  - I2 `is_subdaily` (infer.rs:122-158): at least 3 adjacent deltas < 86400
  *    AND at least 60% of all deltas < 86400.
  *
  * Spark-first design: lag() over (symbol, ts) gives the delta stream; the
  * mode is an aggregation over (symbol, delta) counts — two narrow shuffles
  * on `symbol`, both partial-aggregated map-side. Lower median uses
  * row_number over the delta multiset (no percentile approx — semantics must
  * be exact for the oracle).
  */
object Infer {

  /** Positive adjacent deltas per symbol, ordered by (ts, tiebreak). */
  def deltas(df: DataFrame, tiebreak: Seq[String] = Seq("arrival")): DataFrame = {
    val order = (col("secs") +: tiebreak.map(col))
    val w = Window.partitionBy(col("symbol")).orderBy(order: _*)
    df.select((Seq(col("symbol"), col("secs")) ++ tiebreak.map(col)): _*)
      .withColumn("delta", col("secs") - lag(col("secs"), 1).over(w))
      .filter(col("delta").isNotNull)
  }

  /** I1 — per-symbol estimated step seconds (mode, else lower median). */
  def estimateStepSeconds(df: DataFrame, tiebreak: Seq[String] = Seq("arrival")): DataFrame = {
    val pos = deltas(df, tiebreak).filter(col("delta") > 0)

    // mode candidates: per-symbol max count, and how many deltas achieve it
    val counts = pos.groupBy("symbol", "delta").agg(count(lit(1)).as("n"))
    val wSym = Window.partitionBy("symbol")
    val modes = counts
      .withColumn("mx", max(col("n")).over(wSym))
      .groupBy("symbol")
      .agg(
        min(when(col("n") === col("mx"), col("delta"))).as("mode_delta"),
        sum(when(col("n") === col("mx"), 1).otherwise(0)).as("n_modes"))

    // lower median over the delta multiset: element at zero-based index
    // (cnt-1)/2 == row_number (cnt+1) div 2 (infer.rs:94-112)
    val wOrd = Window.partitionBy("symbol").orderBy("delta")
    val medians = pos
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wSym))
      .filter(col("rn") === (col("cnt") + 1).divide(2).cast("long"))
      .select(col("symbol"), col("delta").as("median_delta"))

    modes
      .join(medians, Seq("symbol"), "left")
      .select(
        col("symbol"),
        when(col("n_modes") === 1, col("mode_delta"))
          .otherwise(col("median_delta"))
          .as("step_seconds"))
  }

  /** I2 — per-symbol subdaily flag. The reference walks DISTINCT sorted
    * timestamps (infer.rs:129-140 advances `last` only on a positive delta,
    * i.e. duplicate timestamps are skipped) — over a sorted stream that is
    * exactly `delta > 0`, so zero deltas count toward neither side of the
    * 60% ratio. Symbols with no positive delta (all rows share one ts)
    * produce no output row, matching the reference's `false` by absence.
    */
  def isSubdaily(df: DataFrame, tiebreak: Seq[String] = Seq("arrival")): DataFrame =
    deltas(df, tiebreak)
      .filter(col("delta") > 0)
      .groupBy("symbol")
      .agg(
        sum(when(col("delta") < 86400, 1L).otherwise(0L)).as("n_subdaily"),
        count(lit(1)).as("n_total"))
      .select(
        col("symbol"),
        (col("n_subdaily") >= 3 && col("n_subdaily") * 5 >= col("n_total") * 3).as("subdaily"))
}
