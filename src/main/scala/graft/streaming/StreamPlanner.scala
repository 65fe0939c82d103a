package graft.streaming

import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy

/** Stream request planning (SURVEY §2 ST1–ST3; reference
  * borsa/src/router/stream.rs:41-288, streaming/planner.rs:21-389).
  * Driver-side planning of which providers stream which symbols.
  */
object StreamPlanner {

  final case class ProviderPlan(
      provider: String,
      registrationIdx: Int,
      allowedSymbols: Set[String],
      score: (Long, Int)) // (min per-symbol rank, registration idx)

  final case class GroupPlan(
      kind: AssetKind,
      exchange: Option[Exchange],
      providers: Seq[ProviderPlan], // sorted by score
      unionSymbols: Set[String])

  /** ST1: group instruments by (kind, exchange); per group compute eligible
    * providers with per-provider allow-sets and scores.
    */
  def planGroups(
      instruments: Seq[Instrument],
      registered: Seq[String],
      canStream: String => Boolean,
      supportsKind: (String, AssetKind) => Boolean,
      policy: Policy.ProviderPolicy): Seq[GroupPlan] = {
    instruments.groupBy(i => (i.kind, i.exchange)).toSeq
      .sortBy { case ((k, e), _) => (k.toString, e.map(_.code).getOrElse("")) }
      .map { case ((kind, exchange), insts) =>
        val symbols = insts.map(_.symbol.value).toSet
        val providers = registered.zipWithIndex.flatMap { case (p, idx) =>
          if (!canStream(p) || !supportsKind(p, kind)) None
          else {
            // per-symbol eligibility under the policy
            val allowed = insts.filter { i =>
              policy.providerRank(
                Policy.Context(Some(i.symbol), Some(kind), exchange), p).isDefined
            }.map(_.symbol.value).toSet
            if (allowed.isEmpty) None
            else {
              val minRank = insts.flatMap { i =>
                policy.providerRank(Policy.Context(Some(i.symbol), Some(kind), exchange), p)
                  .map(_._1)
              }.minOption.getOrElse(Policy.UnlistedRank)
              Some(ProviderPlan(p, idx, allowed, (minRank, idx)))
            }
          }
        }.sortBy(_.score)
        GroupPlan(kind, exchange, providers, providers.flatMap(_.allowedSymbols).toSet)
      }
  }

  /** ST2 strict-symbol rejection (stream.rs:86-125): requested symbols left
    * with zero eligible streaming providers, while stream-capable
    * connectors exist → error.
    */
  def checkStrictRejection(
      groups: Seq[GroupPlan],
      requested: Seq[Instrument],
      anyStreamCapable: Boolean): Either[BorsaError, Unit] = {
    val covered = groups.flatMap(_.unionSymbols).toSet
    val rejected = requested.map(_.symbol.value).distinct.filterNot(covered.contains)
    if (rejected.nonEmpty && anyStreamCapable)
      Left(BorsaError.StrictSymbolsRejected(rejected))
    else Right(())
  }

  final case class SupervisorAssignment(
      primary: String,
      symbols: Set[String],
      failoverChain: Seq[String]) // primary first, then the others in score order

  /** ST3 per-symbol primary election + supervisor sharding
    * (stream.rs:127-288): when any symbol has an explicit rank, each symbol
    * elects its primary (lowest (rank, idx) among providers allowing it);
    * symbols group by primary, one supervisor per primary, chain =
    * [primary, others…]. Otherwise a single group-level supervisor.
    */
  def assignSupervisors(
      group: GroupPlan,
      policy: Policy.ProviderPolicy): Seq[SupervisorAssignment] = {
    val anyExplicit = group.unionSymbols.exists { s =>
      group.providers.exists { p =>
        policy.providerRank(
          Policy.Context(Some(Symbol(s)), Some(group.kind), group.exchange), p.provider)
          .exists(_._1 != Policy.UnlistedRank)
      }
    }
    if (!anyExplicit) {
      group.providers.headOption.toSeq.map { first =>
        SupervisorAssignment(first.provider, group.unionSymbols, group.providers.map(_.provider))
      }
    } else {
      val primaries = group.unionSymbols.groupBy { s =>
        group.providers.filter(_.allowedSymbols.contains(s)).minBy { p =>
          val rank = policy.providerRank(
            Policy.Context(Some(Symbol(s)), Some(group.kind), group.exchange), p.provider)
            .map(_._1).getOrElse(Policy.UnlistedRank)
          (rank, p.registrationIdx)
        }.provider
      }
      primaries.toSeq.sortBy(_._1).map { case (primary, symbols) =>
        val others = group.providers.map(_.provider).filterNot(_ == primary)
        SupervisorAssignment(primary, symbols, primary +: others)
      }
    }
  }
}
