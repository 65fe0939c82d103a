package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.streaming.SupervisorFsm._
import graft.streaming.SupervisorFsm.Action._
import graft.streaming.SupervisorFsm.Event._

/** Scenario + model tests for the supervisor FSM (reference scenarios in
  * borsa/tests/router/stream: failover, failback priority, cooldown,
  * strict rejection, startup failure after full round).
  */
class SupervisorFsmSpec extends AnyFunSuite {

  private def fresh(n: Int, symbols: Set[String] = Set("A", "B")) = Supervisor(
    providers = Vector.fill(n)(ProviderState.Idle),
    providerAllow = Vector.fill(n)(symbols),
    providerCanStream = Vector.fill(n)(true),
    requiredSymbols = symbols,
    capability = "stream-quotes")

  test("startup requests the first provider; success activates and notifies") {
    val (s1, a1) = fresh(2).handle(BackoffTick)
    assert(a1.collect { case RequestStart(id, _) => id } == List(0))
    assert(s1.providers(0).isInstanceOf[ProviderState.Connecting])
    val (s2, a2) = s1.handle(ProviderStartSucceeded(0, Set("A", "B")))
    assert(a2.head == NotifyInitial(Right(())))
    assert(s2.phase == Phase.Running)
    assert(s2.providers(0) == ProviderState.Active(Set("A", "B")))
  }

  test("ST5 coverage: second provider is not started for already-covered symbols") {
    val (s1, _) = fresh(2).handle(BackoffTick)
    val (s2, _) = s1.handle(ProviderStartSucceeded(0, Set("A", "B")))
    // provider 1 has no uncovered work -> no start attempts
    assert(!s2.shouldAttemptStarts)
  }

  test("failover: primary failure starts the next provider in the chain") {
    val (s1, _) = fresh(2).handle(BackoffTick)
    val (s2, a2) = s1.handle(ProviderStartFailed(0, BorsaError.Data("boom")))
    assert(s2.providers(0) == ProviderState.InCooldown)
    assert(a2.collect { case RequestStart(id, _) => id } == List(1))
  }

  test("startup fails only after a full round with zero actives (supervisor_sm.rs:369-408)") {
    val (s1, _) = fresh(2).handle(BackoffTick)
    val (s2, a2) = s1.handle(ProviderStartFailed(0, BorsaError.Data("e0")))
    assert(a2.collect { case n: NotifyInitial => n }.isEmpty) // round not done
    val (s3, a3) = s2.handle(ProviderStartFailed(1, BorsaError.Data("e1")))
    assert(s3.phase == Phase.Terminated)
    a3 match {
      case List(NotifyInitial(Left(BorsaError.AllProvidersFailed(errs)))) =>
        assert(errs.size == 2)
      case other => fail(s"expected collapsed startup failure, got $other")
    }
  }

  test("ST6 preemption: higher-priority activation stops overlapping lower sessions") {
    val (s1, _) = fresh(2).handle(BackoffTick)
    val (s2, _) = s1.handle(ProviderStartFailed(0, BorsaError.Data("boom")))
    val (s3, _) = s2.handle(ProviderStartSucceeded(1, Set("A", "B")))
    assert(s3.phase == Phase.Running)
    // provider 0 recovers: cooldown cleared on tick, retried, succeeds
    val (s4, _) = s3.handle(BackoffTick)
    assert(s4.providers(0) == ProviderState.Connecting(Set("A", "B")) ||
      s4.providers(0) == ProviderState.IdleFromCooldown)
    val (s5, a5) = s4.handle(ProviderStartSucceeded(0, Set("A", "B")))
    assert(a5.exists { case PreemptSessions(ids) => ids == Seq(1); case _ => false })
  }

  test("ST7 backoff: grows exponentially capped, resets on activation from cooldown") {
    var s = fresh(1).copy(providerCanStream = Vector(true))
    // fail, tick, fail, tick... backoff should double up to max
    val (s1, _) = s.handle(BackoffTick)
    val (s2, _) = s1.handle(ProviderStartFailed(0, BorsaError.Data("x")))
    assert(s2.phase == Phase.Terminated) // single provider: round exhausted
    // multi-provider running-phase backoff growth
    var st = fresh(2)
    val (a, _) = st.handle(BackoffTick)
    var cur = a.handle(ProviderStartSucceeded(0, Set("A", "B")))._1
    assert(cur.backoffMs == 500)
    cur = cur.handle(SessionEnded(0, Set("A", "B")))._1
    val (afterTick, acts) = cur.handle(BackoffTick)
    // attempted starts again for cleared provider; backoff grew (no actives)
    assert(acts.exists { case _: RequestStart => true; case _ => false })
    assert(afterTick.backoffMs == 1000)
    // re-activation via Connecting does NOT reset backoff (reference:
    // supervisor_sm.rs:330-343 — only an activation that still sees
    // IdleFromCooldown, i.e. a racing start, resets to min)
    val (recovered, _) = afterTick.handle(ProviderStartSucceeded(0, Set("A", "B")))
    assert(recovered.backoffMs == 1000)
    // racing-start path: success lands while provider is IdleFromCooldown
    val racing = recovered.copy(
      providers = recovered.providers.updated(1, ProviderState.IdleFromCooldown))
    val (reset, _) = racing.handle(ProviderStartSucceeded(1, Set("A")))
    assert(reset.backoffMs == reset.backoff.minMs)
  }

  test("jitter is within [delay, delay + pct)") {
    val cfg = BackoffConfig()
    assert(jittered(1000, cfg, () => 0.0) == 1000)
    assert(jittered(1000, cfg, () => 0.999) == 1199)
  }

  test("shutdown from any phase stops everything and becomes terminal-ish") {
    val (s1, _) = fresh(2).handle(BackoffTick)
    val (s2, a2) = s1.handle(Shutdown)
    assert(s2.phase == Phase.ShuttingDown)
    assert(a2 == List(StopAll, AwaitAll))
    // events after shutdown are ignored
    val (s3, a3) = s2.handle(ProviderStartSucceeded(0, Set("A")))
    assert(a3.isEmpty && s3.phase == Phase.ShuttingDown)
  }

  test("model invariant: a symbol is never subscribed by two providers where an earlier provider already covers it") {
    // random event walk; after every step, Connecting/Active symbol sets of
    // later providers must not contain symbols covered by earlier ones
    val rnd = new scala.util.Random(42)
    var s = fresh(3, Set("A", "B", "C"))
    val events: Seq[Int => Event] = Seq(
      id => ProviderStartSucceeded(id, s.providers(id) match {
        case ProviderState.Connecting(ss) => ss
        case _ => Set("A")
      }),
      id => ProviderStartFailed(id, BorsaError.Data("x")),
      id => SessionEnded(id, Set.empty),
      _ => BackoffTick)
    s = s.handle(BackoffTick)._1
    (0 until 200).foreach { _ =>
      val ev = events(rnd.nextInt(events.size))(rnd.nextInt(3))
      s = s.handle(ev)._1
      if (s.phase == Phase.Running) {
        val covered = scala.collection.mutable.Set.empty[String]
        s.providers.foreach {
          case ProviderState.Connecting(ss) => covered ++= ss
          case ProviderState.Active(ss) =>
            // no symbol here may be covered by an EARLIER Connecting/Active —
            // checked incrementally via the accumulating set? Active sets may
            // overlap transiently until preemption executes; assert only that
            // computeNeededSymbolsFor never proposes covered symbols
            covered ++= ss
          case _ => ()
        }
        s.providers.indices.foreach { i =>
          if (s.providers(i) == ProviderState.Idle || s.providers(i) == ProviderState.IdleFromCooldown) {
            val needed = s.computeNeededSymbolsFor(i)
            needed.foreach { sym =>
              // needed symbols must be uncovered or only covered later-in-chain
              val coveredBefore = s.providers.take(i).exists {
                case ProviderState.Active(ss) => ss.contains(sym)
                case ProviderState.Connecting(ss) => ss.contains(sym)
                case _ => false
              }
              assert(!coveredBefore, s"provider $i proposed $sym already covered earlier")
            }
          }
        }
      }
    }
  }

  test("rapid flapping: backoff caps at max, FSM never wedges, recovery still possible") {
    var s = fresh(2)
    s = s.handle(BackoffTick)._1
    // 20 flap cycles: start succeeds, session dies, tick clears, retry...
    (1 to 20).foreach { _ =>
      s.providers.indices.foreach { i =>
        s.providers(i) match {
          case ProviderState.Connecting(ss) =>
            s = s.handle(ProviderStartSucceeded(i, ss))._1
            s = s.handle(SessionEnded(i, ss))._1
          case _ => ()
        }
      }
      s = s.handle(BackoffTick)._1
    }
    assert(s.backoffMs <= s.backoff.maxMs)
    assert(s.phase == Phase.Running)
    // after the storm a start can still succeed and the FSM is healthy
    val connecting = s.providers.indexWhere(_.isInstanceOf[ProviderState.Connecting])
    assert(connecting >= 0, s"expected a retry in flight, state=${s.providers}")
    val syms = s.providers(connecting).asInstanceOf[ProviderState.Connecting].symbols
    val (recovered, _) = s.handle(ProviderStartSucceeded(connecting, syms))
    assert(recovered.providers(connecting) == ProviderState.Active(syms))
  }
}
