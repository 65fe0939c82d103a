package graft.timeseries

import graft.SparkSpec

/** Split back-adjustment: prices strictly before a split scale by den/num
  * cumulatively; at/after pass through; symbols without splits untouched;
  * factor-product overflow fails fast.
  */
class AdjustSpec extends SparkSpec {
  import spark.implicits._

  test("prices before a split scale by den/num, cumulative across splits; others untouched") {
    // S: 2:1 split at t=100, then 3:1 at t=200
    val splits = Seq(("S", 100L, 2L, 1L), ("S", 200L, 3L, 1L)).toDF("symbol", "ts", "num", "den")
    val prices = Seq(
      ("S", 50L, 1L, 600000L), // before both: *1/6
      ("S", 100L, 2L, 600000L), // at first split ts (not strictly before): *1/3
      ("S", 150L, 3L, 600000L), // before second only: *1/3
      ("S", 250L, 4L, 600000L), // after both: unchanged
      ("Z", 50L, 5L, 600000L) // no splits: unchanged
    ).toDF("symbol", "secs", "event_id", "price_micros")
    val out = Adjust.backAdjustSplits(prices, splits,
        priceTsCol = "secs", splitTsCol = "ts", valueCol = "price_micros")
      .orderBy("event_id").select("adj_price_micros").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(100000L, 200000L, 200000L, 600000L, 600000L))
  }

  test("invalid split rows (null / non-positive ratios) error, never silently unadjust") {
    val prices = Seq(("S", 50L, 1L, 1000000L)).toDF("symbol", "secs", "event_id", "price_micros")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    for (bad <- Seq(Option.empty[Long], Some(0L), Some(-2L))) {
      val splits = Seq(("S", 100L, bad, Some(1L))).toDF("symbol", "ts", "num", "den")
      val e = intercept[Exception] {
        Adjust.backAdjustSplits(prices, splits,
          priceTsCol = "secs", splitTsCol = "ts", valueCol = "price_micros").collect()
      }
      assert(messages(e).exists(_.contains("split num must be")), s"num=$bad got: $e")
    }
  }

  test("value * denominator-product overflow fails fast instead of silently wrapping") {
    // den product 5^13 ≈ 1.22e9 (< 2^31, passes the factor guard); a value
    // of 2^33 micros times that product would wrap Long — must raise, not
    // return a wrapped adjusted price
    val splits = (0 until 13).map(i => ("S", i.toLong, 1L, 5L)).toDF("symbol", "ts", "num", "den")
    val prices = Seq(("S", -1L, 1L, 1L << 33)).toDF("symbol", "secs", "event_id", "price_micros")
    val e = intercept[Exception] {
      Adjust.backAdjustSplits(prices, splits,
        priceTsCol = "secs", splitTsCol = "ts", valueCol = "price_micros").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("would overflow Long")), s"got: $e")
    // the same magnitudes in a SAFE combination still succeed: big value,
    // den product 1 (num-only splits divide, never multiply the value)
    val numOnly = (0 until 13).map(i => ("S", i.toLong, 5L, 1L)).toDF("symbol", "ts", "num", "den")
    val ok = Adjust.backAdjustSplits(prices, numOnly,
        priceTsCol = "secs", splitTsCol = "ts", valueCol = "price_micros")
      .select("adj_price_micros").collect().map(_.getLong(0))
    assert(ok.toSeq == Seq((1L << 33) / math.pow(5, 13).toLong))
  }

  test("factor-product overflow fails fast instead of silently wrapping") {
    // 8^11 = 2^33: over the operator's 2^31 bound but under Long overflow
    // (an actual Long overflow would already throw via ANSI arithmetic)
    val splits = (0 until 11).map(i => ("S", i.toLong, 8L, 1L)).toDF("symbol", "ts", "num", "den")
    val prices = Seq(("S", -1L, 1L, 1000000L)).toDF("symbol", "secs", "event_id", "price_micros")
    val e = intercept[Exception] {
      Adjust.backAdjustSplits(prices, splits,
        priceTsCol = "secs", splitTsCol = "ts", valueCol = "price_micros").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("split factor product")), s"got: $e")
  }

  // ------------------------------------------------------------- dividends

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

  private def divAdjust(prices: org.apache.spark.sql.DataFrame,
      divs: org.apache.spark.sql.DataFrame) =
    Adjust.backAdjustDividends(prices, divs,
      priceTsCol = "secs", divTsCol = "dts", valueCol = "price_micros", amountCol = "amount")

  test("dividend: prices before the ex-time scale by (P - amount)/P off the prior close") {
    // reference close for the t=100 dividend is the t=90 price (1_000_000);
    // amount 50_000 -> factor (1e6-5e4)*1e9 DIV 1e6 = 950_000_000 ppb
    val divs = Seq(("S", 100L, 50000L)).toDF("symbol", "dts", "amount")
    val prices = Seq(
      ("S", 50L, 1L, 2000000L),  // before: * 0.95
      ("S", 90L, 2L, 1000000L),  // the reference close itself: * 0.95
      ("S", 100L, 3L, 1000000L), // at the ex-time (not strictly before): unchanged
      ("S", 150L, 4L, 1000000L), // after: unchanged
      ("Z", 50L, 5L, 700000L)    // no dividends: unchanged
    ).toDF("symbol", "secs", "event_id", "price_micros")
    val out = divAdjust(prices, divs)
      .orderBy("event_id").select("adj_price_micros").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1900000L, 950000L, 1000000L, 1000000L, 700000L))
  }

  test("dividend property: equals a latest-to-earliest truncating-fold model on random fixtures") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val syms = Seq("A", "B", "C")
      val priceRows = for {
        s <- syms; i <- 0 until 120
      } yield (s, i.toLong * 10 + rnd.nextInt(5), rnd.nextInt(120) + i, 10000L + rnd.nextInt(2000000))
      val prices = priceRows.zipWithIndex
        .map { case ((s, ts, _, v), id) => (s, ts, id.toLong, v) }
        .toDF("symbol", "secs", "event_id", "price_micros")
      val divRows = for {
        s <- syms; k <- 1 to (1 + rnd.nextInt(4))
      } yield (s, k.toLong * 250 + rnd.nextInt(100), 1L + rnd.nextInt(900))
      val divs = divRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (sym, ts)
        .toDF("symbol", "dts", "amount")

      // model: per dividend, ref = max price at the max secs strictly before;
      // per price, fold factors of later dividends in DESC ex-time order
      val pBySym = priceRows.zipWithIndex
        .map { case ((s, ts, _, v), id) => (s, ts, id.toLong, v) }
        .groupBy(_._1)
      val dBySym = divs.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      val factors = dBySym.map { case (s, ds) =>
        s -> ds.map { case (_, dts, amt) =>
          val before = pBySym(s).filter(_._2 < dts)
          val maxTs = before.map(_._2).max
          val ref = before.filter(_._2 == maxTs).map(_._4).max
          (dts, (ref - amt) * 1000000000L / ref)
        }.toSeq.sortBy(-_._1)
      }
      val expected = pBySym.values.flatten.map { case (s, ts, id, v) =>
        val cum = factors.getOrElse(s, Seq.empty[(Long, Long)]).filter(_._1 > ts)
          .foldLeft(1000000000L) { case (acc, (_, f)) => acc * f / 1000000000L }
        id -> (if (cum == 1000000000L) v else v * cum / 1000000000L)
      }.toMap
      val got = divAdjust(prices, divs)
        .select("event_id", "adj_price_micros").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed: " +
        s"diff=${(got.toSet -- expected.toSet).take(5)} / ${(expected.toSet -- got.toSet).take(5)}")
    }
  }

  test("dividend guards: no prior price, amount >= reference, duplicates all fail fast") {
    val prices = Seq(("S", 100L, 1L, 500000L), ("S", 200L, 2L, 600000L))
      .toDF("symbol", "secs", "event_id", "price_micros")
    // ex-time at/before the first price: no reference close
    val early = Seq(("S", 100L, 10L)).toDF("symbol", "dts", "amount")
    val e1 = intercept[Exception] { divAdjust(prices, early).collect() }
    assert(messages(e1).exists(_.contains("no price strictly before")), s"got: $e1")
    // amount >= reference close
    val total = Seq(("S", 150L, 500000L)).toDF("symbol", "dts", "amount")
    val e2 = intercept[Exception] { divAdjust(prices, total).collect() }
    assert(messages(e2).exists(_.contains("cannot be back-adjusted")), s"got: $e2")
    // duplicate (key, ex-time)
    val dup = Seq(("S", 150L, 10L), ("S", 150L, 20L)).toDF("symbol", "dts", "amount")
    val e3 = intercept[Exception] { divAdjust(prices, dup).collect() }
    assert(messages(e3).exists(_.contains("duplicate")), s"got: $e3")
    // negative amount
    val neg = Seq(("S", 150L, -5L)).toDF("symbol", "dts", "amount")
    val e4 = intercept[Exception] { divAdjust(prices, neg).collect() }
    assert(messages(e4).exists(_.contains("non-negative")), s"got: $e4")
  }

  test("dividend: a NULL reference close errors, never silently nulls the adjusted column") {
    // the only price before the ex-time has a null value — adjusting off it
    // is undefined and must raise, not propagate null through the factor
    val divs = Seq(("S", 100L, 10L)).toDF("symbol", "dts", "amount")
    val prices = Seq(("S", 50L, 1L, Option.empty[Long]), ("S", 150L, 2L, Some(500000L)))
      .toDF("symbol", "secs", "event_id", "price_micros")
    val e = intercept[Exception] { divAdjust(prices, divs).collect() }
    assert(messages(e).exists(_.contains("reference price must be positive")), s"got: $e")
  }

  test("dividend: value * cumulative factor overflow fails fast; unadjusted rows are exempt") {
    // cum < 1e9 (a real dividend) and a value past Long.Max DIV cum must raise
    val divs = Seq(("S", 100L, 50000L)).toDF("symbol", "dts", "amount")
    // the huge value sits EARLIEST so the plain t=90 price stays the
    // reference close — only the final multiply overflows
    val big = Seq(("S", 50L, 1L, Long.MaxValue / 100000000L), ("S", 90L, 2L, 1000000L))
      .toDF("symbol", "secs", "event_id", "price_micros")
    val e = intercept[Exception] { divAdjust(big, divs).collect() }
    assert(messages(e).exists(_.contains("would overflow Long")), s"got: $e")
    // the same huge value AFTER every ex-time multiplies by exactly 1e9/1e9
    // and takes the shortcut branch — no spurious overflow error
    val late = Seq(("S", 50L, 1L, 1000000L), ("S", 500L, 2L, Long.MaxValue / 2))
      .toDF("symbol", "secs", "event_id", "price_micros")
    val ok = divAdjust(late, divs).orderBy("event_id")
      .select("adj_price_micros").collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(950000L, Long.MaxValue / 2))
  }
}
