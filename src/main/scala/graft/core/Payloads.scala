package graft.core

/** Typed capability payloads (reference shapes: borsa-core re-exports of
  * paft types as constructed in borsa-mock/src/fixtures — Earnings
  * {yearly, quarterly, quarterly_eps}, EsgScores{e,s,g: Option},
  * OptionChain{calls, puts}, statement rows as vectors, NewsArticle list).
  */
object Payloads {

  final case class EarningsYear(year: Int, revenue: Option[BigDecimal], earnings: Option[BigDecimal])
  final case class EarningsQuarter(period: String, revenue: Option[BigDecimal], earnings: Option[BigDecimal])
  final case class EarningsQuarterEps(period: String, epsActual: Option[BigDecimal], epsEstimate: Option[BigDecimal])
  final case class Earnings(
      yearly: Seq[EarningsYear],
      quarterly: Seq[EarningsQuarter],
      quarterlyEps: Seq[EarningsQuarterEps])

  final case class StatementRow(
      period: String, // e.g. "2023" or "2023Q4"
      item: String, // line item name
      value: Option[BigDecimal],
      currency: Option[String])

  final case class EsgScores(
      environmental: Option[BigDecimal],
      social: Option[BigDecimal],
      governance: Option[BigDecimal])

  final case class NewsArticle(
      title: String,
      publisher: Option[String],
      link: Option[String],
      publishedTs: Option[Long],
      summary: Option[String])

  final case class NewsRequest(limit: Int = 10)

  final case class OptionGreeks(
      delta: Option[Double], gamma: Option[Double],
      theta: Option[Double], vega: Option[Double])

  final case class OptionContract(
      contractSymbol: String,
      strike: BigDecimal,
      expirationTs: Long,
      lastPrice: Option[BigDecimal],
      bid: Option[BigDecimal],
      ask: Option[BigDecimal],
      openInterest: Option[Long],
      impliedVolatility: Option[Double],
      greeks: Option[OptionGreeks])

  final case class OptionChain(calls: Seq[OptionContract], puts: Seq[OptionContract])

  sealed trait HolderKind { def id: String }
  object HolderKind {
    case object Major extends HolderKind { val id = "major-holders" }
    case object Institutional extends HolderKind { val id = "institutional-holders" }
    case object MutualFund extends HolderKind { val id = "mutual-fund-holders" }
    case object InsiderTransactions extends HolderKind { val id = "insider-transactions" }
    case object InsiderPurchases extends HolderKind { val id = "insider-purchases" }
    case object InsiderRoster extends HolderKind { val id = "insider-roster" }
    val all: Seq[HolderKind] = Seq(Major, Institutional, MutualFund,
      InsiderTransactions, InsiderPurchases, InsiderRoster)
  }

  final case class HolderRow(
      holder: String,
      shares: Option[Long],
      pctHeld: Option[BigDecimal],
      reportedTs: Option[Long],
      transaction: Option[String]) // for insider-transaction kinds

  final case class CalendarEvents(
      earningsDates: Seq[Long],
      exDividendTs: Option[Long],
      dividendTs: Option[Long])

  final case class Recommendation(
      period: String,
      strongBuy: Int, buy: Int, hold: Int, sell: Int, strongSell: Int)

  final case class RecommendationSummary(
      mean: Option[BigDecimal],
      key: Option[String]) // e.g. "buy"

  final case class PriceTarget(
      low: Option[BigDecimal],
      high: Option[BigDecimal],
      mean: Option[BigDecimal],
      median: Option[BigDecimal],
      analysts: Option[Int])

  final case class UpgradeDowngrade(
      ts: Long,
      firm: String,
      toGrade: String,
      fromGrade: Option[String],
      action: String) // up | down | init | main
}
