package graft

import graft.connector.MockConnector
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy
import graft.streaming.StreamController

/** Façade integration: the full API surface over mock connectors with the
  * default middleware stack.
  */
class GraftSpec extends SparkSpec {

  private def graft(policy: Policy.ProviderPolicy = Policy.ProviderPolicy()) =
    new Graft(spark, Seq(new MockConnector("alpha"), new MockConnector("beta")), policy)

  private val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)

  test("quote routes by policy order with fallback") {
    val g = graft(Policy.ProviderPolicy().withGlobal(Seq("beta", "alpha")))
    assert(g.quote(aapl).exists(_.symbol == "AAPL"))
    // sentinel NOTFOUND falls through both providers and collapses
    val nf = g.quote(Instrument(Symbol("NOTFOUND"), None, AssetKind.Equity))
    assert(nf == Left(BorsaError.NotFound("quote for NOTFOUND")))
  }

  test("quotes batch returns partial successes and per-symbol failures") {
    val g = graft()
    val (oks, fails) = g.quotes(Seq(aapl, Instrument(Symbol("FAIL"), None, AssetKind.Equity)))
    assert(oks.map(_.symbol) == Seq("AAPL"))
    assert(fails.keySet == Set("FAIL"))
  }

  test("history end-to-end through the façade") {
    val g = graft()
    val req = HistoryRequest(Interval.D1, Some(1704067200L), Some(1704067200L + 5 * 86400), None)
    val Right(res) = g.history(aapl, req)
    assert(res.candles.count() == 5)
  }

  test("Graft.fromConfig: JSON config drives routing and middleware budgets end-to-end") {
    val json =
      """{"routing": {"global": {"providers": ["alpha"], "strict": true}},
        |"middleware": {"cache": null, "blacklist": null,
        |               "quota": {"limit": 2, "windowMs": 3600000}}}""".stripMargin
    val Right(cfg) = routing.PolicySerde.fromJson(json)
    val g = Graft.fromConfig(spark,
      Seq(new MockConnector("alpha"), new MockConnector("beta")), cfg)
    // strict global routing: only alpha serves; no cache, so each call
    // spends one of the 2 quota units
    assert(g.quote(aapl).isRight)
    assert(g.quote(aapl).isRight)
    assert(g.quote(aapl).isLeft, "third uncached call must exhaust the configured quota")
  }

  test("MW1 e2e: repeated history calls are served from the connector-layer cache") {
    var historyCalls = 0
    val counting = new MockConnector("c") {
      override def history(inst: Instrument, req: HistoryRequest) = {
        historyCalls += 1; super.history(inst, req)
      }
    }
    val g = new Graft(spark, Seq(counting))
    val req = HistoryRequest(Interval.D1, Some(1704067200L), Some(1704067200L + 5 * 86400), None)
    assert(g.history(aapl, req).isRight)
    assert(g.history(aapl, req).isRight)
    assert(historyCalls == 1, "second identical request must be a cache hit")
    // a different request misses
    assert(g.history(aapl, req.copy(endEpoch = Some(1704067200L + 3 * 86400))).isRight)
    assert(historyCalls == 2)
    // flag bits are part of the cache identity (the reference HistoryKey
    // carries all 4 flags): a raw-close request must NOT hit the adjusted
    // entry
    assert(g.history(aapl, req.copy(autoAdjust = false)).isRight)
    assert(historyCalls == 3)
  }

  test("search dedups by symbol and applies limit after merge") {
    val g = graft()
    val Right(report) = g.search("ZZ", limit = Some(2))
    assert(report.payload.size == 2)
    assert(report.payload.map(_.symbol).distinct.size == 2)
  }

  test("info composes quote+profile+isin with COALESCE precedence") {
    val g = graft()
    val Right(report) = g.info(aapl)
    assert(report.payload.name.contains("AAPL Inc.")) // quote shortname wins
    assert(report.payload.isin.exists(_.startsWith("US")))
  }

  test("fastInfo falls back price -> previousClose") {
    val g = graft()
    assert(g.fastInfo(aapl).exists(_.last > 0))
  }

  test("generic capability routing (Q4 surface)") {
    val g = graft()
    assert(g.capability(aapl, "earnings").exists(_("capability") == "earnings"))
  }

  test("streamQuotes without stream-capable providers is Unsupported") {
    val runner = new StreamController.SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = Right(())
      def stop(id: Int): Unit = ()
    }
    graft().streamQuotes(Seq(aapl), runner) match {
      case Left(BorsaError.Unsupported(_)) => ()
      case other => fail(s"expected unsupported (mock has no streaming), got $other")
    }
  }

  test("streamQuotes plans, starts a provider session, and hands back a stoppable handle") {
    val streaming = new Graft(spark, Seq(
      new MockConnector("alpha", MockConnector.Script(extraCapabilities = Set("stream-quotes"))),
      new MockConnector("beta", MockConnector.Script(extraCapabilities = Set("stream-quotes")))))
    var started = List.empty[(Int, Seq[String])]
    var stopped = List.empty[Int]
    val runner = new StreamController.SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        started ::= (id, symbols); Right(())
      }
      def stop(id: Int): Unit = stopped ::= id
    }
    val Right(handle) = streaming.streamQuotes(Seq(aapl), runner)
    assert(started.map(_._1) == List(0))
    assert(started.head._2 == Seq("AAPL"))
    handle.stop()
    assert(stopped.contains(0))
  }

  test("typed Q4 verbs: earnings, statements, esg, news, option chain route and cache") {
    val g = graft()
    val Right(e) = g.earnings(aapl)
    assert(e.yearly.map(_.year) == Seq(2021, 2022, 2023))
    val Right(is) = g.incomeStatement(aapl, quarterly = true)
    assert(is.map(_.item).toSet == Set("revenue", "net_income") && is.forall(_.period == "2023Q4"))
    val Right(esg) = g.esg(aapl)
    assert(esg.environmental.isDefined && esg.governance.isDefined)
    val Right(news) = g.news(aapl)
    assert(news.nonEmpty && news.head.title.contains("AAPL"))
    val Right(exps) = g.optionsExpirations(aapl)
    assert(exps.size == 2)
    val Right(chain) = g.optionChain(aapl, Some(exps.head))
    assert(chain.calls.size == 3 && chain.puts.size == 3)
    assert(chain.calls.forall(_.expirationTs == exps.head))
    // sentinel NOTFOUND flows through typed routing too
    assert(g.earnings(Instrument(Symbol("NOTFOUND"), None, AssetKind.Equity)).isLeft)
  }

  test("full typed capability surface: holders, calendar, recommendations, price target, upgrades") {
    import _root_.graft.core.Payloads._
    val g = graft()
    HolderKind.all.foreach { kind =>
      val Right(rows) = g.holders(aapl, kind)
      assert(rows.size == 2, kind.id)
      assert(rows.forall(_.transaction.isDefined == kind.id.startsWith("insider")), kind.id)
    }
    val Right(cal) = g.calendar(aapl)
    assert(cal.earningsDates.size == 2 && cal.exDividendTs.isDefined)
    val Right(recs) = g.recommendations(aapl)
    assert(recs.map(_.period) == Seq("0m", "-1m"))
    val Right(sum) = g.recommendationsSummary(aapl)
    assert(sum.key.contains("buy"))
    val Right(pt) = g.priceTarget(aapl)
    assert(pt.low.exists(_ < pt.high.get))
    val Right(ud) = g.upgradesDowngrades(aapl)
    assert(ud.head.action == "up")
  }
}
