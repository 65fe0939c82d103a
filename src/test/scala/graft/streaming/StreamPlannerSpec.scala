package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._
import graft.routing.Policy
import graft.streaming.StreamPlanner._

/** ST1–ST3 planning (reference: borsa/src/router/stream.rs:41-288,
  * streaming/planner.rs:21-389).
  */
class StreamPlannerSpec extends AnyFunSuite {

  private def inst(sym: String, kind: AssetKind = AssetKind.Equity, ex: Option[String] = None) =
    Instrument(Symbol(sym), ex.map(Exchange), kind)

  private val registered = Seq("a", "b", "c")
  private val allStream = (_: String) => true
  private val allKinds = (_: String, _: AssetKind) => true

  test("ST1 groups by (kind, exchange) and scores providers by (min rank, registration idx)") {
    val policy = Policy.ProviderPolicy().withGlobal(Seq("b", "a"))
    val groups = planGroups(
      Seq(inst("X"), inst("Y"), inst("BTC", AssetKind.Crypto)),
      registered, allStream, allKinds, policy)
    assert(groups.size == 2)
    val equity = groups.find(_.kind == AssetKind.Equity).get
    // b rank 0 < a rank 1 < c unlisted
    assert(equity.providers.map(_.provider) == Seq("b", "a", "c"))
    assert(equity.unionSymbols == Set("X", "Y"))
  }

  test("ST1 strict rules restrict per-provider allow-sets") {
    val policy = Policy.ProviderPolicy()
      .withRule(Policy.Selector(symbol = Some(Symbol("X"))), Seq("a"), strict = true)
    val groups = planGroups(Seq(inst("X"), inst("Y")), registered, allStream, allKinds, policy)
    val g = groups.head
    // X only via a; Y via everyone
    assert(g.providers.find(_.provider == "a").get.allowedSymbols == Set("X", "Y"))
    assert(g.providers.find(_.provider == "b").get.allowedSymbols == Set("Y"))
    assert(g.unionSymbols == Set("X", "Y"))
  }

  test("ST2 strict rejection: uncovered symbols while stream-capable connectors exist") {
    val policy = Policy.ProviderPolicy()
      .withGlobal(Seq("a"), strict = true)
    // provider a cannot stream -> no groups cover anything
    val groups = planGroups(Seq(inst("X")), registered, _ == "b", allKinds, policy)
    assert(checkStrictRejection(groups, Seq(inst("X")), anyStreamCapable = true)
      == Left(graft.core.Errors.BorsaError.StrictSymbolsRejected(Seq("X"))))
    // no stream-capable connectors at all -> not a strict rejection
    assert(checkStrictRejection(groups, Seq(inst("X")), anyStreamCapable = false).isRight)
  }

  test("ST3 without explicit ranks: one group-level supervisor, chain in score order") {
    val policy = Policy.ProviderPolicy()
    val groups = planGroups(Seq(inst("X"), inst("Y")), registered, allStream, allKinds, policy)
    val assignments = assignSupervisors(groups.head, policy)
    assert(assignments.size == 1)
    assert(assignments.head.symbols == Set("X", "Y"))
    assert(assignments.head.failoverChain == Seq("a", "b", "c")) // registration order
  }

  test("ST3 with explicit ranks: per-symbol primary election shards supervisors") {
    val policy = Policy.ProviderPolicy()
      .withRule(Policy.Selector(symbol = Some(Symbol("X"))), Seq("b"))
      .withRule(Policy.Selector(symbol = Some(Symbol("Y"))), Seq("c"))
    val groups = planGroups(Seq(inst("X"), inst("Y")), registered, allStream, allKinds, policy)
    val assignments = assignSupervisors(groups.head, policy)
    assert(assignments.size == 2)
    val byPrimary = assignments.map(a => a.primary -> a).toMap
    assert(byPrimary("b").symbols == Set("X"))
    assert(byPrimary("c").symbols == Set("Y"))
    // chain = primary first, then the rest
    assert(byPrimary("b").failoverChain.head == "b")
    assert(byPrimary("c").failoverChain.head == "c")
  }
}
