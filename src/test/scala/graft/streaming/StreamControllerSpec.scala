package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.streaming.StreamController._
import graft.streaming.SupervisorFsm._

class StreamControllerSpec extends AnyFunSuite {

  private def fresh(n: Int) = Supervisor(
    providers = Vector.fill(n)(ProviderState.Idle),
    providerAllow = Vector.fill(n)(Set("A", "B")),
    providerCanStream = Vector.fill(n)(true),
    requiredSymbols = Set("A", "B"),
    capability = "stream-quotes")

  private class ScriptedRunner(fails: Set[Int] = Set.empty) extends SessionRunner {
    var started = List.empty[(Int, Seq[String])]
    var stopped = List.empty[Int]
    def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
      started ::= (id, symbols)
      if (fails.contains(id)) Left(BorsaError.Data(s"p$id down")) else Right(())
    }
    def stop(id: Int): Unit = stopped ::= id
  }

  private val noTicks: (Long, () => Unit) => Unit = (_, _) => ()

  test("startup succeeds when the first provider activates") {
    val runner = new ScriptedRunner
    val c = new Controller(fresh(2), runner, noTicks)
    val handle = c.awaitStartup()
    assert(handle.isRight)
    assert(runner.started.map(_._1) == List(0))
    assert(c.currentState.providers(0) == ProviderState.Active(Set("A", "B")))
  }

  test("failover: first provider fails, second activates; startup still succeeds") {
    val runner = new ScriptedRunner(fails = Set(0))
    val c = new Controller(fresh(2), runner, noTicks)
    assert(c.awaitStartup().isRight)
    assert(runner.started.reverse.map(_._1) == List(0, 1))
    assert(c.currentState.providers(1).isInstanceOf[ProviderState.Active])
  }

  test("all providers fail: startup reports the collapsed error and terminates") {
    val runner = new ScriptedRunner(fails = Set(0, 1))
    val c = new Controller(fresh(2), runner, noTicks)
    c.awaitStartup() match {
      case Left(BorsaError.AllProvidersFailed(errs)) => assert(errs.size == 2)
      case other => fail(s"expected collapse, got $other")
    }
    assert(c.currentState.phase == Phase.Terminated)
  }

  test("ST12 handle.stop() stops sessions and terminates") {
    val runner = new ScriptedRunner
    val c = new Controller(fresh(1), runner, noTicks)
    val Right(handle) = c.awaitStartup()
    handle.stop()
    assert(c.currentState.phase == Phase.ShuttingDown)
    assert(runner.stopped.contains(0))
  }

  test("failback priority: once cooldown clears, the primary is re-elected and the lower session preempted (router_stream_failback_priority.rs)") {
    val runner = new ScriptedRunner
    val c = new Controller(fresh(2), runner, noTicks)
    assert(c.awaitStartup().isRight) // P0 active
    // P0's session ends → P0 cools down, the scan fails over to P1
    c.enqueue(Event.SessionEnded(0, Set("A", "B")))
    assert(c.currentState.providers(0) == ProviderState.InCooldown)
    assert(c.currentState.providers(1).isInstanceOf[ProviderState.Active])
    // the next tick clears the cooldown → priority order re-elects P0 and
    // preempts P1's now-redundant overlapping session
    c.enqueue(Event.BackoffTick)
    assert(c.currentState.providers(0).isInstanceOf[ProviderState.Active],
      "primary did not fail back")
    assert(runner.started.reverse.map(_._1) == List(0, 1, 0))
    assert(runner.stopped.contains(1),
      "failback must preempt the lower-priority overlapping session")
  }

  test("cooldown: a failed provider is skipped by scans until a backoff tick clears it (router_stream_cooldown.rs)") {
    var failing = Set(0)
    val runner = new ScriptedRunner {
      override def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        started ::= (id, symbols)
        if (failing.contains(id)) Left(BorsaError.Data(s"p$id down")) else Right(())
      }
    }
    val c = new Controller(fresh(2), runner, noTicks)
    assert(c.awaitStartup().isRight) // P0 failed → cooldown; P1 active
    assert(c.currentState.providers(0) == ProviderState.InCooldown)
    failing = Set.empty // P0 heals, but its cooldown window still stands
    val startsBefore = runner.started.size
    // a scan triggered mid-window (P1's session ends) must NOT retry P0
    c.enqueue(Event.SessionEnded(1, Set("A", "B")))
    assert(runner.started.size == startsBefore, "cooldown was not honored by the scan")
    assert(c.currentState.phase == Phase.Running, "FSM wedged with all providers cooling")
    // the tick clears cooldowns → P0 (higher priority) is elected
    c.enqueue(Event.BackoffTick)
    assert(c.currentState.providers(0).isInstanceOf[ProviderState.Active])
    assert(runner.started.count(_._1 == 0) == 2)
  }

  test("downstream drop: the consumer going away stops every session (router_stream_downstream_drop.rs)") {
    val runner = new ScriptedRunner
    val c = new Controller(fresh(2), runner, noTicks)
    assert(c.awaitStartup().isRight) // P0 active
    c.enqueue(Event.DownstreamClosed)
    assert(runner.stopped.contains(0), "active session leaked after downstream drop")
    assert(c.currentState.phase == Phase.ShuttingDown ||
      c.currentState.phase == Phase.Terminated)
  }

  test("ST12 drop: close() never blocks the dropper, even when a session stop blocks") {
    val stopGate = new java.util.concurrent.CountDownLatch(1)
    val runner = new ScriptedRunner {
      override def stop(id: Int): Unit = {
        stopGate.await() // a session whose teardown hangs
        super.stop(id)
      }
    }
    val c = new Controller(fresh(1), runner, noTicks)
    val Right(handle) = c.awaitStartup()
    val t0 = System.nanoTime()
    handle.close() // drop path: must return immediately
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 500, s"drop blocked the caller for $elapsedMs ms")
    assert(runner.stopped.isEmpty, "stop still blocked in the background")
    stopGate.countDown() // teardown proceeds best-effort
    c.awaitTerminated()
    assert(runner.stopped.contains(0), "dropped handle leaked the session")
  }

  test("a preempted provider is reported ended: no phantom Active, chain recovers when the elected provider dies") {
    var failing = Set(0)
    val runner = new ScriptedRunner {
      override def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        started ::= (id, symbols)
        if (failing.contains(id)) Left(BorsaError.Data(s"p$id down")) else Right(())
      }
    }
    val c = new Controller(fresh(2), runner, noTicks)
    assert(c.awaitStartup().isRight) // P0 down → P1 active
    failing = Set.empty
    c.enqueue(Event.BackoffTick) // P0 heals → elected → preempts P1
    assert(c.currentState.providers(0).isInstanceOf[ProviderState.Active])
    assert(runner.stopped.contains(1))
    // the preempted session acknowledged the stop: P1 is in cooldown, NOT
    // phantom-Active claiming coverage it can no longer provide
    assert(c.currentState.providers(1) == ProviderState.InCooldown,
      s"preempted provider state: ${c.currentState.providers(1)}")
    // elected provider dies → a tick must re-elect SOMEONE (the wedge
    // this guards against: a phantom-Active P1 makes the scan see the
    // symbols as covered forever)
    c.enqueue(Event.SessionEnded(0, Set("A", "B")))
    c.enqueue(Event.BackoffTick)
    assert(c.currentState.providers.exists(_.isInstanceOf[ProviderState.Active]),
      "chain wedged after the elected provider died post-preemption")
  }

  test("concurrent stop/close interleavings: idempotent teardown, no deadlock (loom_stream_handle.rs:61,:91,:111)") {
    (1 to 25).foreach { i =>
      val runner = new ScriptedRunner
      val c = new Controller(fresh(2), runner, noTicks)
      val Right(handle) = c.awaitStartup()
      val threads = Seq(
        new Thread(() => handle.stop()),
        new Thread(() => handle.close()),
        new Thread(() => handle.stop()))
      threads.foreach(_.start())
      threads.foreach(_.join(5000))
      assert(threads.forall(!_.isAlive), s"iteration $i: teardown deadlocked")
      c.awaitTerminated()
      assert(runner.stopped.contains(0), s"iteration $i: session leaked")
      assert(c.currentState.phase == Phase.ShuttingDown ||
        c.currentState.phase == Phase.Terminated, s"iteration $i: non-terminal phase")
    }
  }

  test("backoff ticks are scheduled with jitter applied") {
    var delays = List.empty[Long]
    val runner = new ScriptedRunner
    val c = new Controller(fresh(1), runner,
      scheduleTick = (d, _) => delays ::= d, rand01 = () => 0.5)
    c.awaitStartup()
    // base 500ms + 50ms jitter (20% * 0.5)
    assert(delays.contains(550L))
  }
}
