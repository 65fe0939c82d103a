package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the payload of the most
  * recent right row with `right.ts <= left.ts` within the same key group
  * (equal timestamps match), optionally bounded by a tolerance window.
  *
  * The reference engine has no as-of join (SURVEY.md §2 negative space: "no
  * theta/range/as-of joins"), but it is the canonical time-series operator a
  * market-data consumer layers on top of merged history (trade → prevailing
  * quote), and Spark has no built-in either — `join` on an inequality
  * degenerates to a broadcast-nested-loop over every (left, right) pair per
  * key.
  *
  * Implementation is the scalable union-carry form, not a join node:
  * tag both inputs, union them, and carry the last non-null right payload
  * forward with a running `last(_, ignoreNulls)` window ordered by
  * `(ts, side)` — right rows sort before left rows at equal timestamps,
  * which yields the inclusive (<=) match. The whole operator is ONE shuffle
  * on the key columns plus a sort within partitions: cost is O(|L|+|R|)
  * rows through a single exchange regardless of how many left rows match
  * each right row, so it survives 100 TB where a range-predicate join
  * explodes. Skewed keys shard like any other window (salt upstream if one
  * symbol dominates).
  *
  * Requirements: right rows must be unique per (keys, rightTs) — with
  * duplicates the carried payload would depend on intra-partition order.
  * Pre-aggregate the right side (e.g. `max_by(payload, arrival)`) first.
  */
object AsOfJoin {

  /** @param keys       equi-join key columns (present in both inputs)
    * @param leftTs     left event-time column (numeric or timestamp)
    * @param rightTs    right event-time column (same type as leftTs)
    * @param payload    right-side columns to attach to each left row
    * @param tolerance  max allowed `leftTs - rightTs` (same unit as the ts
    *                   columns); matches older than this become NULL
    * @param matchedTs  output column name holding the matched right ts
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val tsType = left.schema(leftTs).dataType
    def typedNull(df: DataFrame, c: String) = lit(null).cast(df.schema(c).dataType).as(c)

    val rightSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast(tsType).as("__t"), lit(0).as("__side")) ++
        payload.map(col) ++
        leftOnly.map(c => typedNull(left, c)): _*)
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side")) ++
        payload.map(c => typedNull(right, c)) ++
        leftOnly.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightSide.unionByName(leftSide)
      .withColumn("__m", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .withColumns(payload.map(c => c -> last(col(c), ignoreNulls = true).over(w)).toMap)
      .where(col("__side") === 1)

    val inTol = tolerance match {
      case Some(tol) => col("__m").isNotNull && (col("__t") - col("__m") <= tol)
      case None      => col("__m").isNotNull
    }
    carried.select(
      keys.map(col) ++
        Seq(col("__t").as(leftTs)) ++
        leftOnly.map(col) ++
        Seq(when(inTol, col("__m")).as(matchedTs)) ++
        payload.map(c => when(inTol, col(c)).as(c)): _*)
  }
}
