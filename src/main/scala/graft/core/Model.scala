package graft.core

/** Domain model (SURVEY §1). Case classes double as Spark `Encoder` schemas
  * for `Dataset[T]` use; all money is BigDecimal + ISO currency code
  * (decimal, never double — aggregation must be exact).
  */
object Model {

  sealed trait AssetKind
  object AssetKind {
    case object Equity extends AssetKind
    case object Fund extends AssetKind
    case object Index extends AssetKind
    case object Crypto extends AssetKind
    case object Forex extends AssetKind
    case object Commodity extends AssetKind
    case object Bond extends AssetKind
    case object Other extends AssetKind
  }

  final case class Exchange(code: String)
  final case class Symbol(value: String)

  /** Instrument identity (reference: borsa/src/core.rs:256-296). */
  final case class Instrument(
      symbol: Symbol,
      exchange: Option[Exchange],
      kind: AssetKind)

  /** Candle intervals with minute arithmetic (borsa-yfinance/src/lib.rs:269-289,
    * minutes()/seconds() accessors borsa/src/router/history.rs:50-63).
    */
  sealed abstract class Interval(val minutes: Option[Long]) {
    def seconds: Option[Long] = minutes.map(_ * 60L)
  }
  object Interval {
    case object I1m extends Interval(Some(1))
    case object I2m extends Interval(Some(2))
    case object I5m extends Interval(Some(5))
    case object I15m extends Interval(Some(15))
    case object I30m extends Interval(Some(30))
    case object I1h extends Interval(Some(60))
    case object I90m extends Interval(Some(90))
    case object D1 extends Interval(None)
    case object D5 extends Interval(None)
    case object W1 extends Interval(None)
    case object M1 extends Interval(None)
    case object M3 extends Interval(None)
    val all: Seq[Interval] = Seq(I1m, I2m, I5m, I15m, I30m, I1h, I90m, D1, D5, W1, M1, M3)
  }

  /** The 27-capability surface (borsa-types/src/capability.rs:12-113). */
  sealed trait Capability { def id: String }
  object Capability {
    private def c(s: String): Capability = new Capability { val id = s }
    val Quote = c("quote"); val Quotes = c("quotes"); val History = c("history")
    val Search = c("search"); val Download = c("download"); val Profile = c("profile")
    val Isin = c("isin"); val FastInfo = c("fast-info"); val Info = c("info")
    val Earnings = c("earnings"); val IncomeStatement = c("income-statement")
    val BalanceSheet = c("balance-sheet"); val Cashflow = c("cashflow")
    val Calendar = c("calendar"); val Recommendations = c("recommendations")
    val RecommendationsSummary = c("recommendations-summary")
    val UpgradesDowngrades = c("upgrades-downgrades"); val PriceTarget = c("price-target")
    val MajorHolders = c("major-holders"); val InstitutionalHolders = c("institutional-holders")
    val MutualFundHolders = c("mutual-fund-holders"); val InsiderTransactions = c("insider-transactions")
    val InsiderPurchases = c("insider-purchases"); val InsiderRoster = c("insider-roster")
    val Esg = c("esg"); val News = c("news"); val OptionsExpirations = c("options-expirations")
    val OptionChain = c("option-chain"); val StreamQuotes = c("stream-quotes")
    val StreamCandles = c("stream-candles"); val StreamOptions = c("stream-options")
  }

  /** OHLCV candle — decimal prices, single series-wide currency column.
    * (borsa-core/src/timeseries/resample.rs:44-48)
    */
  final case class Candle(
      symbol: String,
      ts: Long, // epoch seconds UTC
      open: BigDecimal,
      high: BigDecimal,
      low: BigDecimal,
      close: BigDecimal,
      closeUnadj: Option[BigDecimal],
      volume: Option[Long],
      currency: String)

  /** Corporate action — flat struct with kind discriminator
    * (merge.rs:174-182; Spark has no sum types in rows).
    */
  final case class Action(
      symbol: String,
      ts: Long,
      kind: String, // dividend | split | capital_gain
      amount: Option[BigDecimal],
      currency: Option[String],
      numerator: Option[Long],
      denominator: Option[Long])

  final case class HistoryMeta(
      timezone: Option[String],
      utcOffsetSeconds: Option[Long])

  final case class HistoryResponse(
      candles: Seq[Candle],
      actions: Seq[Action],
      adjusted: Boolean,
      meta: Option[HistoryMeta])

  final case class Quote(
      symbol: String,
      price: Option[BigDecimal],
      previousClose: Option[BigDecimal],
      currency: Option[String],
      shortname: Option[String],
      exchange: Option[String],
      marketState: Option[String],
      dayVolume: Option[Long])

  /** Provider attribution span (borsa-types/src/attribution.rs:5-40). */
  final case class Span(provider: String, start: Long, end: Long)
  final case class Attribution(spans: Seq[Span])

  /** Report envelopes: payload + accumulated non-fatal warnings
    * (borsa-types/src/reports.rs:14-47 — partial-success semantics).
    */
  final case class Report[A](payload: A, warnings: Seq[Errors.BorsaError])

  final case class HistoryRequest(
      interval: Interval,
      startEpoch: Option[Long],
      endEpoch: Option[Long],
      period: Option[String],
      prepost: Boolean = false,
      actions: Boolean = true,
      autoAdjust: Boolean = true,
      keepna: Boolean = false)
}
