package graft.connector

import graft.core.Errors.BorsaError
import graft.core.Model._

/** Deterministic mock connector (reference: borsa-mock/src/lib.rs:30-90
  * sentinel symbols; borsa-mock/src/dynamic.rs:15-36 scripted behaviors).
  *
  * Sentinels: FAIL → connector error; RATELIMIT → RateLimitExceeded;
  * TIMEOUT → 200 ms delay (the orchestrator's per-call timeout decides);
  * NOTFOUND → NotFound. Everything else returns deterministic fixtures
  * seeded by the symbol text.
  */
class MockConnector(
    override val name: String = "mock",
    script: MockConnector.Script = MockConnector.Script()) extends Connector {

  def capabilities: Set[String] =
    Set("quote", "history", "search", "profile", "isin",
      // the ×19 generic single-payload capabilities (Q4 surface)
      "earnings", "income-statement", "balance-sheet", "cashflow", "calendar",
      "recommendations", "recommendations-summary", "upgrades-downgrades",
      "price-target", "major-holders", "institutional-holders",
      "mutual-fund-holders", "insider-transactions", "insider-purchases",
      "insider-roster", "esg", "news", "options-expirations", "option-chain") ++
      script.extraCapabilities

  override def supportedIntervals: Seq[Interval] = script.supportedIntervals

  private def sentinel(symbol: String, capability: String): Either[BorsaError, Unit] =
    symbol match {
      case "FAIL" =>
        Left(BorsaError.Connector(name, BorsaError.Other(s"forced failure: $capability")))
      case "RATELIMIT" =>
        Left(BorsaError.Connector(name, BorsaError.RateLimitExceeded(0, 0)))
      case "TIMEOUT" =>
        Thread.sleep(200); Right(())
      case "NOTFOUND" =>
        Left(BorsaError.NotFound(s"$capability for $symbol"))
      case _ => script.behavior(capability) match {
        case MockConnector.Succeed   => Right(())
        case MockConnector.Fail(e)   => Left(e)
        case MockConnector.Delay(ms) => Thread.sleep(ms); Right(())
      }
    }

  private def seed(s: String): Long = s.foldLeft(7L)((a, c) => a * 31 + c)

  override def quote(inst: Instrument): Either[BorsaError, Quote] =
    sentinel(inst.symbol.value, "quote").map { _ =>
      val base = BigDecimal(100 + (seed(inst.symbol.value) % 400).abs)
      Quote(inst.symbol.value, Some(base), Some(base - 1), Some("USD"),
        Some(s"${inst.symbol.value} Inc."), script.exchangeFor(inst.symbol.value),
        Some("REGULAR"), Some(1000000L))
    }

  override def history(inst: Instrument, req: HistoryRequest): Either[BorsaError, HistoryResponse] =
    sentinel(inst.symbol.value, "history").map { _ =>
      val step = req.interval.seconds.getOrElse(86400L)
      val start = req.startEpoch.getOrElse(1704067200L) // 2024-01-01
      val end = req.endEpoch.getOrElse(start + step * 10)
      val n = ((end - start) / step).min(script.maxCandles).max(0)
      val candles = (0L until n).map { i =>
        val ts = start + i * step
        val p = BigDecimal(100) + BigDecimal((seed(inst.symbol.value) + i) % 50)
        // raw-close provenance: scripted delta below the adjusted close
        // (mirrors an adjusted feed carrying close_unadj, adapter.rs style)
        val raw = script.closeUnadjDelta.map(d => p + 1 - d)
        Candle(inst.symbol.value, ts, p, p + 2, p - 2, p + 1, raw, Some(1000 + i), "USD")
      }
      val actions =
        if (req.actions) script.actions.map(_.copy(symbol = inst.symbol.value)) else Seq.empty
      HistoryResponse(candles, actions, adjusted = script.adjusted, meta = script.meta)
    }

  override def search(query: String): Either[BorsaError, Seq[SearchResult]] =
    sentinel(query, "search").map { _ =>
      script.searchResults.getOrElse(query,
        (1 to 3).map(i => SearchResult(s"$query$i", Some(s"$query$i Corp"),
          script.exchangeFor(s"$query$i"), Some(AssetKind.Equity))))
    }

  override def profile(inst: Instrument): Either[BorsaError, Profile] =
    sentinel(inst.symbol.value, "profile").map { _ =>
      Profile(Some(s"${inst.symbol.value} Incorporated"), Some("Technology"),
        Some("Software"), Some(s"US${(seed(inst.symbol.value) % 1000000000L).abs}"))
    }

  override def isin(inst: Instrument): Either[BorsaError, String] =
    sentinel(inst.symbol.value, "isin").map(_ => s"US${(seed(inst.symbol.value) % 1000000000L).abs}")

  override def fetchCapability(cap: String, inst: Instrument): Either[BorsaError, Map[String, String]] =
    sentinel(inst.symbol.value, cap).map(_ => Map("capability" -> cap, "symbol" -> inst.symbol.value))

  // deterministic typed fixtures (seeded by symbol, like the reference's
  // borsa-mock/src/fixtures)
  import graft.core.Payloads._

  override def earnings(inst: Instrument): Either[BorsaError, Earnings] =
    sentinel(inst.symbol.value, "earnings").map { _ =>
      val base = (seed(inst.symbol.value) % 1000).abs
      Earnings(
        yearly = (2021 to 2023).map(y =>
          EarningsYear(y, Some(BigDecimal(base * 1000 + y)), Some(BigDecimal(base * 100 + y)))),
        quarterly = Seq(EarningsQuarter("2023Q4", Some(BigDecimal(base * 250)), Some(BigDecimal(base * 25)))),
        quarterlyEps = Seq(EarningsQuarterEps("2023Q4", Some(BigDecimal(base) / 100), Some(BigDecimal(base + 5) / 100))))
    }

  private def stmtRows(inst: Instrument, cap: String, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    sentinel(inst.symbol.value, cap).map { _ =>
      val period = if (quarterly) "2023Q4" else "2023"
      Seq("revenue", "net_income").map(item =>
        StatementRow(period, item, Some(BigDecimal((seed(inst.symbol.value + item) % 100000).abs)), Some("USD")))
    }
  override def incomeStatement(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    stmtRows(inst, "income-statement", quarterly)
  override def balanceSheet(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    stmtRows(inst, "balance-sheet", quarterly)
  override def cashflow(inst: Instrument, quarterly: Boolean): Either[BorsaError, Seq[StatementRow]] =
    stmtRows(inst, "cashflow", quarterly)

  override def esg(inst: Instrument): Either[BorsaError, EsgScores] =
    sentinel(inst.symbol.value, "esg").map { _ =>
      val s = (seed(inst.symbol.value) % 50).abs
      EsgScores(Some(BigDecimal(s)), Some(BigDecimal(s + 10)), Some(BigDecimal(s + 20)))
    }

  override def news(inst: Instrument, req: NewsRequest): Either[BorsaError, Seq[NewsArticle]] =
    sentinel(inst.symbol.value, "news").map { _ =>
      (1 to math.min(req.limit, 3)).map(i =>
        NewsArticle(s"${inst.symbol.value} headline $i", Some(name),
          Some(s"https://example.invalid/${inst.symbol.value}/$i"),
          Some(1704067200L + i * 3600L), Some(s"summary $i")))
    }

  override def optionsExpirations(inst: Instrument): Either[BorsaError, Seq[Long]] =
    sentinel(inst.symbol.value, "options-expirations").map(_ =>
      Seq(1717200000L, 1719792000L))

  override def optionChain(inst: Instrument, expiration: Option[Long]): Either[BorsaError, OptionChain] =
    sentinel(inst.symbol.value, "option-chain").map { _ =>
      val exp = expiration.getOrElse(1717200000L)
      val spot = BigDecimal(100 + (seed(inst.symbol.value) % 400).abs)
      def contract(kind: String, strikeOff: Int) = OptionContract(
        s"${inst.symbol.value}$exp$kind$strikeOff", spot + strikeOff, exp,
        Some(BigDecimal(5)), Some(BigDecimal(4)), Some(BigDecimal(6)),
        Some(100L + strikeOff), Some(0.25),
        Some(OptionGreeks(Some(0.5), Some(0.1), Some(-0.05), Some(0.2))))
      OptionChain(
        calls = Seq(contract("C", -5), contract("C", 0), contract("C", 5)),
        puts = Seq(contract("P", -5), contract("P", 0), contract("P", 5)))
    }

  override def holders(inst: Instrument, kind: HolderKind): Either[BorsaError, Seq[HolderRow]] =
    sentinel(inst.symbol.value, kind.id).map { _ =>
      (1 to 2).map(i => HolderRow(s"${kind.id}-holder-$i",
        Some(1000L * i), Some(BigDecimal(i) / 100), Some(1704067200L),
        if (kind.id.startsWith("insider")) Some("Buy") else None))
    }

  override def calendar(inst: Instrument): Either[BorsaError, CalendarEvents] =
    sentinel(inst.symbol.value, "calendar").map(_ =>
      CalendarEvents(Seq(1714521600L, 1722470400L), Some(1709251200L), Some(1710460800L)))

  override def recommendations(inst: Instrument): Either[BorsaError, Seq[Recommendation]] =
    sentinel(inst.symbol.value, "recommendations").map(_ =>
      Seq(Recommendation("0m", 5, 10, 3, 1, 0), Recommendation("-1m", 4, 11, 3, 1, 0)))

  override def recommendationsSummary(inst: Instrument): Either[BorsaError, RecommendationSummary] =
    sentinel(inst.symbol.value, "recommendations-summary").map(_ =>
      RecommendationSummary(Some(BigDecimal("1.8")), Some("buy")))

  override def priceTarget(inst: Instrument): Either[BorsaError, PriceTarget] =
    sentinel(inst.symbol.value, "price-target").map { _ =>
      val base = BigDecimal(100 + (seed(inst.symbol.value) % 400).abs)
      PriceTarget(Some(base - 20), Some(base + 40), Some(base + 10), Some(base + 8), Some(12))
    }

  override def upgradesDowngrades(inst: Instrument): Either[BorsaError, Seq[UpgradeDowngrade]] =
    sentinel(inst.symbol.value, "upgrades-downgrades").map(_ =>
      Seq(UpgradeDowngrade(1704067200L, "MockFirm", "Buy", Some("Hold"), "up")))
}

object MockConnector {
  sealed trait Behavior
  case object Succeed extends Behavior
  final case class Fail(error: BorsaError) extends Behavior
  final case class Delay(ms: Long) extends Behavior

  /** Scripted per-capability behaviors (port of borsa-mock/src/dynamic.rs). */
  final case class Script(
      behaviors: Map[String, Behavior] = Map.empty,
      supportedIntervals: Seq[Interval] = Seq(Interval.I1m, Interval.I5m, Interval.I1h, Interval.D1),
      adjusted: Boolean = true,
      meta: Option[HistoryMeta] = None,
      actions: Seq[Action] = Seq.empty,
      maxCandles: Long = 1000L,
      closeUnadjDelta: Option[BigDecimal] = None,
      exchanges: Map[String, String] = Map.empty,
      searchResults: Map[String, Seq[SearchResult]] = Map.empty,
      extraCapabilities: Set[String] = Set.empty) {
    def behavior(capability: String): Behavior = behaviors.getOrElse(capability, Succeed)
    def exchangeFor(symbol: String): Option[String] = exchanges.get(symbol)
  }
}
