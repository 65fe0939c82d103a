package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Provider-attribution sessionization (SURVEY §2 H6).
  *
  * Reference semantics (/root/reference/borsa/src/router/history.rs:588-634):
  * after the first-wins merge each timestamp is attributed to exactly one
  * provider; the sorted timeline is grouped into maximal runs of a constant
  * provider, each emitted as a span (provider, start_ts, end_ts).
  *
  * Spark-first design: classic gaps-and-islands — a change flag via lag(),
  * a running sum to number sessions, then one aggregation. Two window passes
  * over the same (symbol, order) partitioning reuse a single sort+shuffle.
  */
object Attribution {

  /** Input: one row per (keys..., orderCol) with a `provider` column,
    * already deduped (post-M1). Output: (keys..., provider, span_start,
    * span_end, n_points) ordered by keys, span_start.
    */
  def spans(
      df: DataFrame,
      keys: Seq[String] = Seq("symbol"),
      orderCol: String = "bucket_ts"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn(
        "__chg",
        when(lag(col("provider"), 1).over(w).isNull ||
             lag(col("provider"), 1).over(w) =!= col("provider"), 1L).otherwise(0L))
      .withColumn("__session", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__session") :+ col("provider")): _*)
      .agg(
        min(col(orderCol)).as("span_start"),
        max(col(orderCol)).as("span_end"),
        count(lit(1)).as("n_points"))
      .drop("__session")
      .orderBy((keys.map(col) :+ col("span_start")): _*)
  }
}
