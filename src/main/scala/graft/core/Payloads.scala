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
}
