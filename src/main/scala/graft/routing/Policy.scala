package graft.routing

import graft.core.Model.{AssetKind, Exchange, Symbol}

/** Routing policy engine (SURVEY §2 F1/F2; reference
  * borsa-types/src/routing_policy.rs:419-531,786-817).
  *
  * Pure control-plane: decides which providers serve a request and in what
  * order. No data-plane equivalent — unit-tested table logic.
  */
object Policy {

  /** Rule applicability selector; all set fields must match. */
  final case class Selector(
      symbol: Option[Symbol] = None,
      kind: Option[AssetKind] = None,
      exchange: Option[Exchange] = None) {
    def specificityBits: (Int, Int, Int) =
      (if (symbol.isDefined) 1 else 0, if (kind.isDefined) 1 else 0, if (exchange.isDefined) 1 else 0)
  }

  final case class Rule(selector: Selector, providers: Seq[String], strict: Boolean)

  final case class Context(
      symbol: Option[Symbol] = None,
      kind: Option[AssetKind] = None,
      exchange: Option[Exchange] = None)

  /** Unlisted-but-eligible rank sentinel (reference usize::MAX). */
  val UnlistedRank: Long = Long.MaxValue

  final case class ProviderPolicy(
      rules: Seq[Rule] = Seq.empty,
      global: Option[(Seq[String], Boolean)] = None) {

    def withRule(selector: Selector, providers: Seq[String], strict: Boolean = false): ProviderPolicy =
      copy(rules = rules :+ Rule(selector, providers, strict))
    def withGlobal(providers: Seq[String], strict: Boolean = false): ProviderPolicy =
      copy(global = Some((providers, strict)))

    /** Best matching rule: max specificity (count, then symbol>kind>exchange
      * bits); ties → the LAST-defined rule wins (routing_policy.rs:464-495).
      */
    def bestRule(ctx: Context): Option[Rule] = {
      var best: Option[(Rule, (Int, Int, Int, Int), Int)] = None
      rules.zipWithIndex.foreach { case (r, idx) =>
        val s = r.selector
        val matches =
          s.symbol.forall(ctx.symbol.contains) &&
          s.kind.forall(ctx.kind.contains) &&
          s.exchange.forall(ctx.exchange.contains)
        if (matches) {
          val (sb, kb, eb) = s.specificityBits
          val spec = (sb + kb + eb, sb, kb, eb)
          best match {
            case None => best = Some((r, spec, idx))
            case Some((_, bspec, bidx)) =>
              if (Ordering[(Int, Int, Int, Int)].gt(spec, bspec) || (spec == bspec && idx > bidx))
                best = Some((r, spec, idx))
          }
        }
      }
      best.map(_._1)
    }

    /** F1 provider rank (routing_policy.rs:509-531): Some((rank, strict)) if
      * eligible; None if a strict rule excludes the provider. Unlisted under
      * a non-strict rule → UnlistedRank.
      */
    def providerRank(ctx: Context, key: String): Option[(Long, Boolean)] =
      bestRule(ctx) match {
        case Some(rule) =>
          rule.providers.indexOf(key) match {
            case -1 => if (rule.strict) None else Some((UnlistedRank, false))
            case i  => Some((i.toLong, rule.strict))
          }
        case None =>
          global match {
            case Some((list, strict)) =>
              list.indexOf(key) match {
                case -1 => if (strict) None else Some((UnlistedRank, false))
                case i  => Some((i.toLong, strict))
              }
            case None => Some((UnlistedRank, false))
          }
      }

    /** F2 `ordered_for_context` (borsa/src/core.rs:407-434): filter eligible,
      * stable-sort by (rank, registration index).
      */
    def orderedForContext(ctx: Context, registered: Seq[String]): Seq[String] =
      registered.zipWithIndex
        .flatMap { case (key, regIdx) =>
          providerRank(ctx, key).map { case (rank, _) => (key, rank, regIdx) }
        }
        .sortBy { case (_, rank, regIdx) => (rank, regIdx) }
        .map(_._1)
  }

  /** S2 exchange-preference sort key (routing_policy.rs:799-817): rank in the
    * preference list, then None-exchange penalty, then original index.
    * Preference scope resolution Symbol > Kind > Global (S2 scope,
    * routing_policy.rs:210-247).
    */
  final case class ExchangePreference(
      bySymbol: Map[Symbol, Seq[Exchange]] = Map.empty,
      byKind: Map[AssetKind, Seq[Exchange]] = Map.empty,
      global: Seq[Exchange] = Seq.empty) {

    def resolve(symbol: Option[Symbol], kind: Option[AssetKind]): Seq[Exchange] =
      symbol.flatMap(bySymbol.get)
        .orElse(kind.flatMap(byKind.get))
        .getOrElse(global)

    def sortKey(prefs: Seq[Exchange], exchange: Option[Exchange], origIdx: Int): (Long, Int, Int) = {
      val rank = exchange.map(e => prefs.indexOf(e)).filter(_ >= 0)
        .map(_.toLong).getOrElse(Long.MaxValue)
      val nonePenalty = if (exchange.isEmpty) 1 else 0
      (rank, nonePenalty, origIdx)
    }
  }
}
