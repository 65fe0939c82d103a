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
}
