package graft.router

import graft.connector.{Connector, Profile}
import graft.core.Errors.BorsaError
import graft.core.Model._

/** Quote/info composition (SURVEY §2 Q1–Q4; reference
  * borsa/src/router/{quotes.rs,info.rs}).
  */
object InfoRouter {

  /** Q1 `quotes` batch (quotes.rs:38-71): per-instrument fetch under a
    * shared deadline; partial successes + per-symbol failures.
    */
  def quotesBatch(
      instruments: Seq[Instrument],
      fetchOne: Instrument => Either[BorsaError, Quote]): (Seq[Quote], Map[String, BorsaError]) = {
    val results = instruments.map(i => i.symbol.value -> fetchOne(i))
    (results.collect { case (_, Right(q)) => q },
     results.collect { case (s, Left(e)) => s -> e }.toMap)
  }

  final case class Info(
      symbol: String,
      name: Option[String],
      sector: Option[String],
      industry: Option[String],
      isin: Option[String],
      price: Option[BigDecimal],
      previousClose: Option[BigDecimal],
      exchange: Option[String],
      marketState: Option[String])

  /** Q2 `info` composition (info.rs:27-199): profile ⋈ quote ⋈ isin with
    * COALESCE precedence — name := quote.shortname else profile.name;
    * isin := explicit else profile's. Sub-call failures → warnings, not
    * aborts (partial success).
    */
  def info(
      inst: Instrument,
      quote: () => Either[BorsaError, Quote],
      profile: () => Either[BorsaError, Profile],
      isin: () => Either[BorsaError, String]): Either[BorsaError, Report[Info]] = {
    val q = quote()
    val p = profile()
    val i = isin()
    val warnings = Seq(q, p, i).collect { case Left(e) if e.isActionable => e }
    (q, p) match {
      case (Left(qe), Left(_)) => Left(qe)
      case _ =>
        val qo = q.toOption
        val po = p.toOption
        Right(Report(Info(
          symbol = inst.symbol.value,
          name = qo.flatMap(_.shortname).orElse(po.flatMap(_.name)),
          sector = po.flatMap(_.sector),
          industry = po.flatMap(_.industry),
          isin = i.toOption.orElse(po.flatMap(_.isin)),
          price = qo.flatMap(_.price),
          previousClose = qo.flatMap(_.previousClose),
          exchange = qo.flatMap(_.exchange),
          marketState = qo.flatMap(_.marketState)), warnings))
    }
  }

  final case class FastInfo(symbol: String, last: BigDecimal, currency: Option[String])

  /** Q3 `fast_info` (info.rs:222-260): quote-only projection; last := price
    * else previous_close; error if both absent.
    */
  def fastInfo(q: Quote): Either[BorsaError, FastInfo] =
    q.price.orElse(q.previousClose) match {
      case Some(last) => Right(FastInfo(q.symbol, last, q.currency))
      case None       => Left(BorsaError.Data(s"quote for ${q.symbol} has no price data"))
    }

  /** F6 `enforce_quote_exchange` (core.rs:276-296): a quote from the wrong
    * exchange is treated as NotFound so routing continues; quotes without an
    * exchange pass.
    */
  def enforceQuoteExchange(inst: Instrument)(q: Quote): Either[BorsaError, Quote] =
    (inst.exchange, q.exchange) match {
      case (Some(pinned), Some(actual)) if pinned.code != actual =>
        Left(BorsaError.NotFound(s"quote for ${inst.symbol.value} on ${pinned.code}"))
      case _ => Right(q)
    }
}
