package graft.examples

import graft.SparkSpec

/** The example corpus is CI-gated like the reference's (`cargo run
  * --example` in its workflows): every example must run green against the
  * mock, and the load-bearing claim of each is asserted — not just
  * "it printed something".
  */
class ExamplesSpec extends SparkSpec {

  test("every example in the corpus runs and produces output") {
    Examples.all.foreach { ex =>
      val out = ex.run(spark)
      assert(out.nonEmpty, s"example '${ex.name}' produced no output")
      assert(!out.exists(_.toLowerCase.contains("failed:")),
        s"example '${ex.name}' reported a failure:\n${out.mkString("\n")}")
    }
  }

  test("00: every capability call traced enter/exit; data-plane jobs observed") {
    val out = Ex00Tracing.run(spark)
    // every ENTER pairs with an EXIT for the same capability
    val enters = out.filter(_.startsWith("ENTER")).map(_.stripPrefix("ENTER"))
    val exits = out.filter(_.startsWith("EXIT")).map(_.stripPrefix("EXIT").replace(" ok", "").replace(" err", ""))
    assert(enters.nonEmpty && enters.map(_.trim.takeWhile(_ != ' ')) == exits.map(_.trim.takeWhile(_ != ' ')))
    assert(Seq("quote", "history", "search").forall(cap => enters.exists(_.contains(cap))),
      s"all three verbs must be traced:\n${out.mkString("\n")}")
    assert(out.exists(l => l.startsWith("spark jobs observed:") && !l.contains(" 0 ")),
      "the history pipeline must submit at least one Spark job")
  }

  test("04: complete price target prints analyst count and low<=mean<=high") {
    val out = Ex04PriceTarget.run(spark)
    assert(out.head == "## Analyst Price Target for NVDA")
    assert(out.exists(_.contains("Based on 12 analysts")))
    def v(tag: String) = BigDecimal(out.find(_.trim.startsWith(s"- $tag:")).get.split("\\$").last)
    assert(v("Low") <= v("Mean") && v("Mean") <= v("High"))
  }

  test("06: all eight capabilities render; both annual and quarterly periods appear") {
    val out = Ex06FundamentalsDeepDive.run(spark)
    assert(out.count(_.startsWith("##")) == 5, "five sections")
    assert(!out.exists(_.contains("unavailable")), s"mock serves all 8:\n${out.mkString("\n")}")
    assert(out.exists(l => l.startsWith("Annual latest 2023:") && l.contains("revenue=")))
    assert(out.exists(l => l.startsWith("Quarterly latest 2023Q4:")))
    assert(out.exists(_.contains(" vs ")), "quarterly EPS actual-vs-estimate line")
    assert(out.exists(_.startsWith("Next Earnings: 2024-")))
  }

  test("19: news honors the request limit upstream and prints title — publisher") {
    val out = Ex19News.run(spark)
    assert(out.head == "articles: 3") // mock caps at 3
    assert(out.tail.forall(_.contains(" — mock")))
    assert(out.tail.forall(_.startsWith("AAPL headline")))
  }

  test("20: esg prints all three pillar scores") {
    val out = Ex20Esg.run(spark)
    assert(out.size == 1)
    val m = raw"E: (\d+), S: (\d+), G: (\d+)".r.findFirstMatchIn(out.head)
    assert(m.isDefined, s"expected numeric pillars, got: ${out.head}")
    // mock fixture: S = E+10, G = E+20
    val Seq(e, s, gv) = m.get.subgroups.map(BigDecimal(_))
    assert(s == e + 10 && gv == e + 20)
  }

  test("01: quote carries price, previous close and market state") {
    val out = Ex01SimpleQuote.run(spark)
    assert(out.exists(_.startsWith("symbol:         AAPL")))
    assert(out.exists(l => l.startsWith("price:") && l.contains("$")))
    assert(out.exists(_.startsWith("market state:   REGULAR")))
  }

  test("02: prime serves the head, backfill the tail, attribution shows both") {
    val out = Ex02HistoryMerge.run(spark)
    assert(out.head == "merged history: 10 candles")
    val spans = out.dropWhile(_ != "attribution:").tail
    assert(spans.size == 2, s"expected 2 attribution spans, got:\n${spans.mkString("\n")}")
    assert(spans.head.contains("'prime'") && spans.head.contains("(3 points)"))
    assert(spans(1).contains("'backfill'") && spans(1).contains("(7 points)"))
  }

  test("03: dedup keeps the preferred exchange's listing and merges the rest") {
    val out = Ex03Search.run(spark)
    assert(out.head.startsWith("results: 3"))
    val zz1 = out.find(_.contains("ZZ1")).get
    assert(zz1.contains("[NMS]"), s"S2 dedup must keep the preferred venue: $zz1")
    assert(out.exists(_.contains("ZZ2")) && out.exists(_.contains("ZZ3")))
  }

  test("08: weekly resample emits Monday-anchored buckets only") {
    val out = Ex08HistoryResampling.run(spark)
    assert(out.head.startsWith("weekly candles:"))
    assert(!out.exists(_.contains("NOT A MONDAY")))
    // 28 daily candles from Mon 2024-01-01 = exactly 4 full weeks
    assert(out.head == "weekly candles: 4")
  }

  test("05: the chain for the nearest expiration carries calls and puts") {
    val out = Ex05OptionsChain.run(spark)
    assert(out.head.startsWith("expirations: ") && out.exists(_.contains("3 calls / 3 puts")))
  }

  test("07: the snapshot composes fundamentals, esg and news") {
    val out = Ex07FinancialSnapshot.run(spark)
    assert(out.count(_.startsWith("FY")) == 3)
    assert(out.exists(_.startsWith("income rows:   revenue=")))
    assert(out.exists(_.startsWith("balance (Q):   2023Q4")))
    assert(out.exists(_.startsWith("esg: E=")))
    assert(out.count(_.startsWith("news: ")) == 2)
  }

  test("09: one bulk download compares 30-day performance across symbols") {
    val out = Ex09StockComparison.run(spark)
    assert(out.head == "30-day performance (3 symbols):")
    assert(out.tail.forall(_.contains("bp")))
  }

  test("10: recommendations, summary and price target compose") {
    val out = Ex10Recommendations.run(spark)
    assert(out.exists(_.startsWith("0m: strongBuy=")))
    assert(out.exists(_.startsWith("summary: mean=")) && out.exists(_.startsWith("price target:")))
  }

  test("11: calendar events surface earnings and dividend dates") {
    val out = Ex11UpcomingEvents.run(spark)
    assert(out.head.startsWith("earnings dates: ") && out.size == 3)
  }

  test("18: all six holder kinds answer through the capability router") {
    val out = Ex18Holders.run(spark)
    graft.core.Payloads.HolderKind.all.foreach(k =>
      assert(out.exists(_.startsWith(s"${k.id}: ")), s"missing ${k.id}"))
    assert(out.exists(_.contains("txn=")), "insider kinds carry transactions")
  }

  test("22: batch quotes succeed partially, failures reported per symbol") {
    val out = Ex22MultiQuotes.run(spark)
    assert(out.count(_.trim.startsWith("AAPL")) == 1 && out.count(_.contains("$")) == 3)
    assert(out.last == "failed symbols: FAIL")
  }

  test("12: the per-symbol rule overrides the kind-level priority") {
    val out = Ex12PerSymbolPriority.run(spark)
    assert(out == Seq(
      "'NORMAL' served from FAST-VENUE",
      "'SPECIAL' served from ACCURATE-VENUE"))
  }

  test("13: fallback, latency race and provider timeout all land on the healthy provider") {
    val out = Ex13FetchStrategies.run(spark)
    assert(out.size == 3)
    out.foreach(l => assert(l.endsWith("SECONDARY"), s"expected SECONDARY to serve: $l"))
  }

  test("14: Deep backfills from both providers, Fallback stops at the first non-empty") {
    val out = Ex14MergeStrategies.run(spark)
    assert(out.size == 2)
    assert(out(0).matches("Deep\\s+: 10 candles from full \\+ short"), out(0))
    assert(out(1).matches("Fallback: 3 candles from short"), out(1))
  }

  test("15: exchange rule flips order, strict pins, F6 demotes mismatched venues") {
    val out = Ex15RoutingPolicy.run(spark)
    assert(out(0).endsWith("slow -> fast"), out(0))
    assert(out(1).endsWith("fast -> slow"), out(1))
    assert(out(2).contains("slow (strict)") && !out(2).contains("fast"), out(2))
    assert(out(3).contains("FAILS"), out(3))
    assert(out(4).contains("served from NASDAQ"), out(4))
  }

  test("16: throttled wire falls back to mock, then the primary recovers") {
    val out = Ex16RateLimited.run(spark)
    assert(out.size == 3)
    assert(out(0).contains("served by primary"))
    assert(out(1).contains("served by mock fallback"))
    assert(out(2).contains("served by primary"))
  }

  test("17: primary refused, backup activates, graceful stop") {
    val out = Ex17StreamingFailover.run(spark)
    assert(out.exists(_.contains("provider 0 -> REFUSED")))
    assert(out.exists(_.contains("session start: provider 1 -> AAPL")))
    assert(out.contains("stream up (failed over to backup)"))
    assert(out.last == "stream stopped")
  }

  test("21: bulk download isolates the failing instrument as a warning") {
    val out = Ex21Download.run(spark)
    assert(out.contains("AAPL: 5 candles") && out.contains("MSFT: 5 candles"))
    assert(!out.exists(_.startsWith("FAIL:")), "failed instrument must contribute no rows")
    assert(out.contains("warnings: 1"))
  }

  test("24: the third call is rejected by quota before reaching the provider") {
    val out = Ex24QuotaMiddleware.run(spark)
    assert(out.count(_.contains("-> ok")) == 2)
    assert(out.last.startsWith("GOOG -> quota exceeded"))
  }
}
