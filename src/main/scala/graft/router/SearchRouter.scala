package graft.router

import graft.connector.{Connector, SearchResult}
import graft.core.Errors
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy.ExchangePreference

/** Search fan-out + preference dedup (SURVEY §2 S1/S2; reference
  * borsa/src/router/macros.rs:92-199, core.rs:298-332).
  */
object SearchRouter {

  /** S1: query all providers (order = routing order), concat in provider
    * order, dedup by exchange preference, then apply `limit` AFTER the
    * merge; actionable errors become warnings; empty results + errors →
    * collapsed error.
    */
  def search(
      providers: Seq[(String, () => Either[BorsaError, Seq[SearchResult]])],
      prefs: ExchangePreference,
      kind: Option[AssetKind] = None,
      limit: Option[Int] = None): Either[BorsaError, Report[Seq[SearchResult]]] = {
    val results = Seq.newBuilder[SearchResult]
    val errors = Seq.newBuilder[BorsaError]
    providers.foreach { case (name, call) =>
      call() match {
        case Right(rs) => results ++= rs
        case Left(e)   => errors += BorsaError.Connector(name, e)
      }
    }
    val concat = results.result()
    val errs = errors.result()
    if (concat.isEmpty && errs.nonEmpty)
      Left(Errors.collapse(errs, "search", None))
    else {
      val deduped = dedupByExchangePreference(concat, prefs, kind)
      val limited = limit.fold(deduped)(deduped.take)
      Right(Report(limited, errs.filter(_.isActionable)))
    }
  }

  /** S2 `dedup_search_results_by_exchange` (core.rs:298-332): group by
    * symbol; within a group pick the best by (preference rank, None-exchange
    * penalty, original index); emit groups in first-seen order.
    */
  def dedupByExchangePreference(
      results: Seq[SearchResult],
      prefs: ExchangePreference,
      kind: Option[AssetKind]): Seq[SearchResult] = {
    val indexed = results.zipWithIndex
    val bySymbol = indexed.groupBy(_._1.symbol)
    val firstSeen = indexed.map { case (r, i) => (r.symbol, i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    bySymbol.toSeq
      .sortBy { case (sym, _) => firstSeen(sym) }
      .map { case (sym, group) =>
        val p = prefs.resolve(Some(Symbol(sym)), kind)
        group.minBy { case (r, idx) =>
          prefs.sortKey(p, r.exchange.map(Exchange), idx)
        }._1
      }
  }
}
