package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import scala.collection.concurrent.TrieMap

import graft.core.Errors.BorsaError
import graft.streaming.SupervisorFsm._

/** Driver-side interpreter of supervisor FSM actions (ST4 runtime + ST12
  * graceful handle; reference borsa/src/router/streaming/controller.rs:33-269,
  * borsa-core/src/stream.rs:60-127).
  *
  * The controller owns the event loop: it feeds events into the pure FSM
  * and executes the returned actions against a [[SessionRunner]] (which in
  * production starts/stops Structured Streaming queries per provider and in
  * tests is a scripted stub). All session outputs multiplex into one
  * downstream (ST10); the per-session allow-filter and monotonic gate live
  * in the query plan (MonotonicGate).
  */
object StreamController {

  /** Provider session runtime SPI: start returns Left on immediate failure;
    * stop is idempotent. Production impl = StreamingQuery management.
    */
  trait SessionRunner {
    def start(providerId: Int, symbols: Seq[String]): Either[BorsaError, Unit]
    def stop(providerId: Int): Unit
    def awaitStopped(): Unit = ()

    /** Multi-chain orchestration (ST3 sharding) calls this once per
      * failover chain before delegating: runners that manage per-session
      * resources return a CHAIN-SCOPED view, so the same provider id
      * appearing in two chains maps to two distinct sessions — and one
      * chain's StopAll/AwaitAll cannot tear down another chain's healthy
      * sessions. Stateless/test runners keep the default (shared `this`).
      */
    def forChain(chain: Int): SessionRunner = this
  }

  /** ST12 stream handle contract (stream.rs:60-127): `stop` = graceful
    * signal + await completion; `close` = the DROP path — best-effort
    * signal that must never block the dropper (the reference's Drop impl
    * sends the one-shot then aborts without awaiting; "the task may not
    * observe the stop signal").
    */
  trait Handle extends AutoCloseable {
    def stop(): Unit
    override def close(): Unit
  }

  final class StreamHandle(controller: Controller) extends Handle {
    def stop(): Unit = { controller.enqueue(Event.Shutdown); controller.awaitTerminated() }
    /** Drop semantics: the teardown (which may block inside a session's
      * stop) runs on a daemon thread so dropping a handle never hangs the
      * caller; on process exit the signal may go unobserved — exactly the
      * reference's drop contract.
      */
    override def close(): Unit = {
      val t = new Thread(() => controller.enqueue(Event.Shutdown), "graft-stream-drop")
      t.setDaemon(true)
      t.start()
    }
  }

  /** One handle over the per-chain supervisor shards (ST3): stopping the
    * stream stops every chain (stream.rs stop_broadcast semantics).
    */
  final class CompositeHandle(handles: Seq[StreamHandle]) extends Handle {
    def stop(): Unit = handles.foreach(_.stop())
    override def close(): Unit = handles.foreach(_.close())
  }

  final class Controller(
      initial: Supervisor,
      runner: SessionRunner,
      scheduleTick: (Long, () => Unit) => Unit,
      rand01: () => Double = () => scala.util.Random.nextDouble()) {

    @volatile private var state = initial
    private val lock = new Object
    @volatile private var startupResult: Option[Either[BorsaError, Unit]] = None
    private val startupLatch = new CountDownLatch(1)
    private val terminatedLatch = new CountDownLatch(1)

    def currentState: Supervisor = state

    def enqueue(event: Event): Unit = lock.synchronized {
      val (next, actions) = state.handle(event)
      state = next
      actions.foreach(execute)
      next.phase match {
        case Phase.Terminated | Phase.ShuttingDown => terminatedLatch.countDown()
        case _ => ()
      }
    }

    private def execute(action: Action): Unit = action match {
      case Action.RequestStart(id, symbols) =>
        // start asynchronously in production; here the runner decides
        runner.start(id, symbols) match {
          case Right(())   => enqueueAsync(Event.ProviderStartSucceeded(id, symbols.toSet))
          case Left(error) => enqueueAsync(Event.ProviderStartFailed(id, error))
        }
      case Action.StopAll =>
        state.providers.indices.foreach(runner.stop)
      case Action.AwaitAll =>
        runner.awaitStopped()
        terminatedLatch.countDown()
      case Action.NotifyInitial(result) =>
        startupResult = Some(result)
        startupLatch.countDown()
      case Action.ScheduleBackoffTick(delayMs) =>
        scheduleTick(jittered(delayMs, state.backoff, rand01), () => enqueue(Event.BackoffTick))
      case Action.PreemptSessions(ids) =>
        ids.foreach(runner.stop)
        // the synchronous analog of the reference's session task
        // acknowledging the stop signal (controller.rs:165 → SessionEnded →
        // InCooldown): without this the preempted provider stays
        // phantom-Active, and a later scan treats its symbols as covered by
        // a session that no longer exists — the chain wedges if the
        // elected provider then dies
        ids.foreach { id =>
          val syms = state.providers(id) match {
            case ProviderState.Active(s) => s
            case _                       => Set.empty[String]
          }
          enqueueAsync(Event.SessionEnded(id, syms))
        }
    }

    /** Re-entrancy guard: start callbacks may fire while holding the lock in
      * tests (synchronous runner) — run them after the current transition.
      */
    private val pending = new java.util.ArrayDeque[Event]()
    private var draining = false
    private def enqueueAsync(event: Event): Unit = {
      pending.add(event)
      if (!draining) {
        draining = true
        try while (!pending.isEmpty) {
          val ev = pending.poll()
          val (next, actions) = state.handle(ev)
          state = next
          actions.foreach(execute)
        } finally draining = false
      }
    }

    /** Startup contract: succeeds iff ≥1 provider activates; else the
      * collapsed error (stream.rs:290-311).
      */
    def awaitStartup(timeoutMs: Long = 10000): Either[BorsaError, StreamHandle] = {
      enqueue(Event.BackoffTick) // kick the first scan round
      startupLatch.await(timeoutMs, TimeUnit.MILLISECONDS)
      startupResult match {
        case Some(Right(()))  => Right(new StreamHandle(this))
        case Some(Left(err))  => Left(err)
        case None             => Left(BorsaError.RequestTimeout(state.capability))
      }
    }

    def awaitTerminated(timeoutMs: Long = 10000): Unit =
      terminatedLatch.await(timeoutMs, TimeUnit.MILLISECONDS)
  }
}
