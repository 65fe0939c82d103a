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
    val acts = splits.groupBy(keyCol).agg(
      collect_list(struct(col(splitTsCol).as("sts"), col("num"), col("den"))).as("__acts"))
    prices
      .join(broadcast(acts), Seq(keyCol), "left")
      .withColumn("__f", expr(
        s"""aggregate(filter(__acts, a -> a.sts > `$priceTsCol`),
           |  named_struct('n', 1L, 'd', 1L),
           |  (acc, a) -> named_struct('n', acc.n * a.num, 'd', acc.d * a.den))""".stripMargin))
      .withColumn("__f", expr(
        // fail fast on factor overflow risk instead of silently wrapping
        """if(__f.n >= 2147483648L or __f.d >= 2147483648L,
          |  named_struct('n', cast(raise_error('backAdjustSplits: split factor product exceeds 2^31 - too many/degenerate splits') as bigint), 'd', 1L),
          |  __f)""".stripMargin))
      .withColumn(s"adj_$valueCol",
        expr(s"coalesce(`$valueCol` * __f.d DIV __f.n, `$valueCol`)"))
      .drop("__acts", "__f")
  }
}
