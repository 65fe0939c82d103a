package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split back-adjustment — the client-side half of the adjustment story.
  * The reference delegates adjusted history to providers (H9 `auto_adjust`
  * rides the request; borsa-yfinance returns provider-adjusted candles),
  * but a consumer holding RAW prices plus the action series (M3's dedup
  * output) needs to apply it locally: for a split of `num` new shares per
  * `den` old at time s, every price strictly BEFORE s scales by den/num,
  * cumulatively across later splits.
  *
  * Exact integer arithmetic end to end: the per-symbol split list (tiny —
  * instruments have a handful of splits ever) broadcasts as an array
  * column, and each price row folds the numerator/denominator PRODUCTS of
  * its later splits with a HOF `aggregate` — multiplication commutes, so
  * `collect_list` order nondeterminism cannot change the result — then
  * applies one integral division. No floats, no window over prices, no
  * shuffle of the price side at all: the whole operator is scan-side
  * behind one broadcast join.
  *
  * Caller contract: splits per symbol must be few enough that the factor
  * products fit a Long (guard: |prod| < 2^31 each side asserted in-plan),
  * which real split histories satisfy by orders of magnitude.
  */
object Adjust {

  /** @param prices (keyCol, priceTsCol, valueCol) rows — valueCol integral
    * @param splits (keyCol, splitTsCol, "num", "den") rows, num/den
    *               integral >= 1
    * @return prices plus `adj_<valueCol>` back-adjusted by later splits
    */
  def backAdjustSplits(
      prices: DataFrame,
      splits: DataFrame,
      keyCol: String = "symbol",
      priceTsCol: String = "ts",
      splitTsCol: String = "ts",
      valueCol: String = "price"): DataFrame = {
    val missing = (Seq(keyCol, priceTsCol, valueCol).filterNot(prices.columns.contains) ++
      Seq(keyCol, splitTsCol, "num", "den").filterNot(splits.columns.contains)).distinct
    require(missing.isEmpty, s"columns absent from an input: ${missing.mkString(", ")}")
    val collisions = Seq("__acts", "__f", s"adj_$valueCol").filter(prices.columns.contains)
    require(collisions.isEmpty,
      s"prices columns collide with internal/output names (rename them): ${collisions.mkString(", ")}")

    // validate each split row in-plan: a null / non-positive / giant ratio
    // must ERROR, never silently fall back to the unadjusted price (the
    // coalesce below is strictly for the no-splits left-join case)
    def validated(c: String) = expr(
      s"""if(`$c` is null or `$c` < 1 or `$c` > 2147483648L,
         |  cast(raise_error(concat('backAdjustSplits: split $c must be an integer in [1, 2^31], got ',
         |    coalesce(cast(`$c` as string), 'NULL'))) as bigint),
         |  cast(`$c` as bigint))""".stripMargin)
    val acts = splits.groupBy(keyCol).agg(
      collect_list(struct(col(splitTsCol).as("sts"),
        validated("num").as("num"), validated("den").as("den"))).as("__acts"))

    // the fold guards the ACCUMULATOR each step: inputs are <= 2^31 and the
    // running product is checked < 2^31 before every multiply, so no
    // intermediate can wrap a Long regardless of ANSI mode; the final
    // product check bounds the last multiply too
    val step =
      """(acc, a) -> named_struct(
        |  'n', if(acc.n >= 2147483648L,
        |          cast(raise_error('backAdjustSplits: split factor product exceeds 2^31 - too many/degenerate splits') as bigint),
        |          acc.n * a.num),
        |  'd', if(acc.d >= 2147483648L,
        |          cast(raise_error('backAdjustSplits: split factor product exceeds 2^31 - too many/degenerate splits') as bigint),
        |          acc.d * a.den))""".stripMargin
    prices
      .join(broadcast(acts), Seq(keyCol), "left")
      .withColumn("__f", expr(
        s"""aggregate(filter(__acts, a -> a.sts > `$priceTsCol`),
           |  named_struct('n', 1L, 'd', 1L), $step)""".stripMargin))
      .withColumn("__f", expr(
        """if(__f.n >= 2147483648L or __f.d >= 2147483648L,
          |  named_struct('n', cast(raise_error('backAdjustSplits: split factor product exceeds 2^31 - too many/degenerate splits') as bigint), 'd', 1L),
          |  __f)""".stripMargin))
      // the final multiply needs its own guard: the factor products are each
      // < 2^31, but value * __f.d can still wrap for |value| >= ~4.3e9 (a
      // $4,300 price in micros) times a large den product. Symmetric compare
      // against Long.Max DIV __f.d (no abs() — abs(Long.MinValue) wraps
      // negative in non-ANSI mode and would sneak past an abs-based check).
      // A null __f (no splits for the key) makes the condition null → else
      // branch → null product → coalesce falls back to the raw value.
      .withColumn(s"adj_$valueCol",
        expr(s"""coalesce(
           |  if(__f.d > 1L and (`$valueCol` > 9223372036854775807L DIV __f.d
           |                  or `$valueCol` < -(9223372036854775807L DIV __f.d)),
           |    cast(raise_error('backAdjustSplits: value * split denominator product would overflow Long - rescale the value column first') as bigint),
           |    `$valueCol` * __f.d DIV __f.n),
           |  `$valueCol`)""".stripMargin))
      .drop("__acts", "__f")
  }
}
