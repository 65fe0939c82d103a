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

  /** Dividend / capital-gain back-adjustment — the total-return half of the
    * adjustment story ([[backAdjustSplits]] covers splits). The reference's
    * `auto_adjust` contract (H9 rides the request; provider-adjusted
    * history is dividend-adjusted too — /root/reference/borsa-core/src/
    * timeseries/merge.rs:174-182 carries `Dividend{ts, amount}` and
    * `CapitalGain{ts, gain}` actions) means a consumer holding RAW prices
    * plus the M3 action series needs the standard ex-date factor applied
    * locally: for a cash distribution `amount` at ex-time s with reference
    * close P (the last price strictly BEFORE s), every price before s
    * scales by (P - amount)/P, cumulatively across later distributions.
    * Capital gains adjust identically — union them into `dividends`.
    *
    * Arithmetic is parts-per-billion fixed point, integers end to end: each
    * factor is `(P - amount) * 1e9 DIV P`, and the cumulative factor folds
    * latest-to-earliest with per-step `DIV 1e9` truncation. Truncating
    * folds do NOT commute, so the fold order is pinned (descending ex-time
    * via `array_sort` on negated ts) — any engine replaying the same order
    * reproduces the exact integers. Per-step products are bounded by
    * 1e9 × 1e9 < 2^63: the fold itself can never overflow; the final
    * value × factor multiply and the reference-price magnitude carry
    * in-plan raise_error guards instead (rescale the value column past
    * ~9.2e9 units).
    *
    * Plan shape (100 TB): prices are scanned exactly twice and NEVER
    * shuffled — (1) reference closes come from ONE map-side-combinable
    * aggregate (explode of each row's later-dividend list, ≤ |dividends per
    * key| fan-out, then max(struct(ts, value)) per (key, ex-ts) — only
    * per-dividend partials cross the wire); (2) the output pass applies the
    * per-key factor array behind a broadcast join, scan-side. The dividend
    * table is control-plane-sized by contract (a handful of actions per
    * instrument).
    *
    * Fail-fast guards (house convention — error, never silently wrong):
    * null/negative amount, duplicate (key, ex-ts) dividend rows, a dividend
    * with NO price strictly before it, amount >= reference price, reference
    * price outside (0, ~9.2e9], a factor or cumulative factor underflowing
    * 1 ppb, and final-multiply overflow.
    *
    * Composing with [[backAdjustSplits]] for the full total-return series:
    * dividend factors are RATIOS, so they are invariant under any uniform
    * scaling of reference price and amount — run splits first on the
    * prices, split-adjust the amounts the same way (one more
    * `backAdjustSplits` call with `valueCol = amount`, exactly how
    * provider feeds ship "split-adjusted dividends"), then run this
    * operator on the adjusted pair. Each factor then equals its raw-series
    * value and the products telescope into the standard provider
    * `adjclose`.
    *
    * @param prices    (keyCol, priceTsCol, valueCol) rows — valueCol and
    *                  priceTsCol integral (micros/epoch-seconds convention)
    * @param dividends (keyCol, divTsCol, amountCol) rows — amountCol in the
    *                  same integral unit as valueCol, as-traded at its
    *                  ex-time (see the composition note for split handling)
    * @return prices plus `adj_<valueCol>` back-adjusted for distributions
    */
  def backAdjustDividends(
      prices: DataFrame,
      dividends: DataFrame,
      keyCol: String = "symbol",
      priceTsCol: String = "ts",
      divTsCol: String = "ts",
      valueCol: String = "price",
      amountCol: String = "amount"): DataFrame = {
    val outCol = s"adj_$valueCol"
    val missing = (Seq(keyCol, priceTsCol, valueCol).filterNot(prices.columns.contains) ++
      Seq(keyCol, divTsCol, amountCol).filterNot(dividends.columns.contains)).distinct
    require(missing.isEmpty, s"columns absent from an input: ${missing.mkString(", ")}")
    val collisions = Seq("__dl", "__d", "__dts", "__amt", "__m", "__divs", "__cum", outCol)
      .filter(prices.columns.contains)
    require(collisions.isEmpty,
      s"prices columns collide with internal/output names (rename them): ${collisions.mkString(", ")}")

    val validAmt = expr(
      s"""if(`$amountCol` is null or `$amountCol` < 0,
         |  cast(raise_error(concat('backAdjustDividends: amount must be a non-negative integer, got ',
         |    coalesce(cast(`$amountCol` as string), 'NULL'))) as bigint),
         |  cast(`$amountCol` as bigint))""".stripMargin)
    val divs = dividends.select(col(keyCol),
      col(divTsCol).cast("long").as("__dts"), validAmt.as("__amt"))

    // per-key dividend list with an IN-PLAN uniqueness guard: a duplicated
    // (key, ex-ts) row would double-apply a factor — and which amount wins
    // would depend on collect order. No driver-side action (this operator
    // runs inside timed query plans).
    val divList = divs.groupBy(keyCol)
      .agg(collect_list(struct(col("__dts"), col("__amt"))).as("__dl"))
      .withColumn("__dl", expr(
        """case when size(__dl) != size(array_distinct(transform(__dl, d -> d.__dts)))
          |  then array(named_struct('__dts',
          |    cast(raise_error('backAdjustDividends: duplicate (key, ts) dividend rows - one amount per ex-time required') as bigint),
          |    '__amt', 1L))
          |  else __dl end""".stripMargin))

    // (1) reference close per dividend: the last price strictly before the
    // ex-time, as ONE aggregate — max(struct(ts, value)) is lexicographic,
    // so ties at the max ts deterministically take the max value
    val refs = prices
      .select(col(keyCol), col(priceTsCol).cast("long").as("__pt"),
        col(valueCol).cast("long").as("__pv"))
      .join(broadcast(divList), Seq(keyCol), "inner")
      .select(col(keyCol), col("__pt"), col("__pv"),
        explode(expr("filter(__dl, d -> d.__dts > __pt)")).as("__d"))
      .groupBy(col(keyCol), col("__d.__dts").as("__dts"))
      .agg(max(struct(col("__pt"), col("__pv"))).as("__m"))

    // per-dividend ppb factor, fully guarded; the left join back to `divs`
    // surfaces dividends whose ex-time precedes ALL prices (they vanished
    // from the explode) as an in-plan error instead of a silent no-op
    val maxRef = Long.MaxValue / 1000000000L
    val fac = divs.join(refs, Seq(keyCol, "__dts"), "left")
      .withColumn("__f", expr(
        s"""case
           |  when __m is null then cast(raise_error(concat(
           |    'backAdjustDividends: no price strictly before dividend at ts ', cast(__dts as string),
           |    ' - drop or re-window such dividends first')) as bigint)
           |  when __m.__pv is null or __m.__pv <= 0 then cast(raise_error('backAdjustDividends: reference price must be positive, got NULL or <= 0') as bigint)
           |  when __m.__pv > ${maxRef}L then cast(raise_error('backAdjustDividends: reference price exceeds $maxRef - rescale the value column first') as bigint)
           |  when __amt >= __m.__pv then cast(raise_error(concat(
           |    'backAdjustDividends: amount ', cast(__amt as string), ' >= reference price ',
           |    cast(__m.__pv as string), ' - a total distribution cannot be back-adjusted')) as bigint)
           |  else (__m.__pv - __amt) * 1000000000L DIV __m.__pv
           |end""".stripMargin))
      .withColumn("__f", expr(
        """if(__f < 1L,
          |  cast(raise_error('backAdjustDividends: factor underflows 1 ppb - rescale the value column first') as bigint),
          |  __f)""".stripMargin))

    // negated ts as the FIRST struct field: array_sort ascending then folds
    // latest-to-earliest, pinning the truncating fold order
    val factArr = fac.groupBy(keyCol)
      .agg(collect_list(struct((-col("__dts")).as("nts"), col("__f").as("f"))).as("__divs"))

    // (2) scan-side application behind one broadcast join
    prices.join(broadcast(factArr), Seq(keyCol), "left")
      .withColumn("__cum", expr(
        s"""aggregate(
           |  array_sort(filter(__divs, d -> d.nts < -cast(`$priceTsCol` as bigint))),
           |  1000000000L, (acc, d) -> acc * d.f DIV 1000000000L)""".stripMargin))
      .withColumn(outCol, expr(
        s"""case
           |  when __divs is null or __cum = 1000000000L then cast(`$valueCol` as bigint)
           |  when __cum < 1L then cast(raise_error('backAdjustDividends: cumulative factor underflows 1 ppb - too many/degenerate distributions') as bigint)
           |  when cast(`$valueCol` as bigint) > 9223372036854775807L DIV __cum
           |    or cast(`$valueCol` as bigint) < -(9223372036854775807L DIV __cum)
           |    then cast(raise_error('backAdjustDividends: value * cumulative factor would overflow Long - rescale the value column first') as bigint)
           |  else cast(`$valueCol` as bigint) * __cum DIV 1000000000L
           |end""".stripMargin))
      .drop("__divs", "__cum")
  }
}
