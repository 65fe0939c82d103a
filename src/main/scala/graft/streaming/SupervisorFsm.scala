package graft.streaming

import graft.core.Errors
import graft.core.Errors.BorsaError

/** Streaming supervisor state machine (SURVEY §2 ST4–ST7; reference
  * borsa/src/router/streaming/supervisor_sm.rs:10-462).
  *
  * Pure FSM: handle(event) → (nextState, actions). The driver-side query
  * controller interprets actions (start Structured Streaming queries, stop
  * superseded ones, schedule ticks). Keeping it pure preserves the
  * reference's model-testability — the FSM is exhaustively checkable with
  * no streaming runtime in the loop.
  *
  * Semantics ported exactly:
  *  - providers scanned round-robin from `startIndex`; a provider is
  *    started iff idle, stream-capable, and has uncovered needed symbols
  *  - symbol coverage & duplicate-feed suppression (ST5): a provider only
  *    subscribes symbols not already covered by an earlier-in-chain
  *    Active/Connecting provider
  *  - activation resets the round and preempts lower-priority overlapping
  *    sessions (ST6); activation from cooldown resets backoff (ST7)
  *  - startup fails only after a full round with zero actives; errors
  *    collapse via ST11
  *  - BackoffTick clears cooldowns, grows backoff exponentially (capped)
  */
object SupervisorFsm {

  sealed trait ProviderState
  object ProviderState {
    case object Idle extends ProviderState
    case object IdleFromCooldown extends ProviderState
    final case class Connecting(symbols: Set[String]) extends ProviderState
    final case class Active(symbols: Set[String]) extends ProviderState
    case object InCooldown extends ProviderState
  }

  sealed trait Phase
  object Phase {
    final case class Startup(accumulatedErrors: List[BorsaError]) extends Phase
    case object Running extends Phase
    case object ShuttingDown extends Phase
    case object Terminated extends Phase
  }

  sealed trait Event
  object Event {
    final case class ProviderStartSucceeded(id: Int, symbols: Set[String]) extends Event
    final case class ProviderStartFailed(id: Int, error: BorsaError) extends Event
    final case class SessionEnded(id: Int, symbols: Set[String]) extends Event
    case object BackoffTick extends Event
    case object DownstreamClosed extends Event
    case object Shutdown extends Event
  }

  sealed trait Action
  object Action {
    final case class RequestStart(id: Int, symbols: Seq[String]) extends Action
    case object StopAll extends Action
    case object AwaitAll extends Action
    final case class NotifyInitial(result: Either[BorsaError, Unit]) extends Action
    final case class ScheduleBackoffTick(delayMs: Long) extends Action
    final case class PreemptSessions(providerIds: Seq[Int]) extends Action
  }

  final case class BackoffConfig(
      minMs: Long = 500L,
      maxMs: Long = 30000L,
      factor: Long = 2L,
      jitterPct: Int = 20) // config.rs:108-117 defaults

  /** ST7 jitter: delay + rand[0, base*jitter%/100) — rng injected for
    * determinism (backoff.rs:4-12).
    */
  def jittered(delayMs: Long, cfg: BackoffConfig, rand01: () => Double): Long =
    delayMs + (rand01() * (delayMs * cfg.jitterPct / 100.0)).toLong

  final case class Supervisor(
      providers: Vector[ProviderState],
      providerAllow: Vector[Set[String]],
      providerCanStream: Vector[Boolean],
      requiredSymbols: Set[String],
      capability: String,
      startIndex: Int = 0,
      scanCursor: Int = 0,
      roundExhausted: Boolean = false,
      backoffMs: Long = 500L,
      backoff: BackoffConfig = BackoffConfig(),
      attemptedSinceLastTick: Boolean = false,
      phase: Phase = Phase.Startup(Nil)) {

    import Action._
    import Event._

    def handle(event: Event): (Supervisor, List[Action]) = {
      val (next0, actions0) = transitionForEvent(event)
      if (next0.shouldAttemptStarts) {
        val (next1, reqs) = next0.computeNeededStarts
        if (reqs.nonEmpty)
          (next1.copy(attemptedSinceLastTick = true), actions0 ++ reqs)
        else (next1, actions0)
      } else (next0, actions0)
    }

    private def transitionForEvent(event: Event): (Supervisor, List[Action]) =
      (phase, event) match {
        case (Phase.Terminated | Phase.ShuttingDown, _) => (this, Nil)

        case (Phase.Startup(_), ProviderStartSucceeded(id, symbols)) =>
          val (next, actions) = handleProviderActivated(id, symbols)
          (next.copy(phase = Phase.Running), NotifyInitial(Right(())) :: actions)

        case (Phase.Running, ProviderStartSucceeded(id, symbols)) =>
          handleProviderActivated(id, symbols)

        case (Phase.Startup(acc), ProviderStartFailed(id, error)) =>
          handleStartupFailure(id, error, acc)

        case (Phase.Running, ProviderStartFailed(id, _)) =>
          (advanceScanCursorForFailure(id), Nil)

        case (_, SessionEnded(id, _)) =>
          (copy(providers = providers.updated(id, ProviderState.InCooldown)), Nil)

        case (_, BackoffTick) => handleBackoffTick()

        case (_, Shutdown | DownstreamClosed) =>
          (copy(phase = Phase.ShuttingDown), List(StopAll, AwaitAll))
      }

    // -------------------------------------------------------- ST5 coverage

    private def coverageCount(sym: String): Int =
      providers.count {
        case ProviderState.Active(ss)     => ss.contains(sym)
        case ProviderState.Connecting(ss) => ss.contains(sym)
        case _                            => false
      }

    private def providerHasSymbolBefore(idx: Int, sym: String): Boolean =
      providers.take(idx).exists {
        case ProviderState.Active(ss)     => ss.contains(sym)
        case ProviderState.Connecting(ss) => ss.contains(sym)
        case _                            => false
      }

    def computeNeededSymbolsFor(id: Int): Seq[String] =
      providerAllow.lift(id).toSeq.flatMap { allow =>
        requiredSymbols.toSeq.sorted.filter { sym =>
          allow.contains(sym) && {
            val covered = coverageCount(sym) > 0
            !covered || !providerHasSymbolBefore(id, sym)
          }
        }
      }

    private def isIdle(s: ProviderState): Boolean =
      s == ProviderState.Idle || s == ProviderState.IdleFromCooldown

    def shouldAttemptStarts: Boolean =
      !roundExhausted && providers.indices.exists { i =>
        isIdle(providers(i)) && providerCanStream.lift(i).getOrElse(false) &&
          computeNeededSymbolsFor(i).nonEmpty
      }

    /** Round-robin scan from scanCursor back around to startIndex. */
    def computeNeededStarts: (Supervisor, List[Action]) = {
      val len = providers.length
      if (len == 0 || roundExhausted) return (this, Nil)
      var self = this
      var i = scanCursor % len
      val start = startIndex % len
      var first = true
      val actions = List.newBuilder[Action]
      var continue = true
      while (continue) {
        if (isIdle(self.providers(i)) && providerCanStream.lift(i).getOrElse(false)) {
          val syms = self.computeNeededSymbolsFor(i)
          if (syms.nonEmpty) {
            self = self.copy(providers = self.providers.updated(i, ProviderState.Connecting(syms.toSet)))
            actions += RequestStart(i, syms)
          }
        }
        if (!first && i == start) continue = false
        else { first = false; i = (i + 1) % len }
      }
      (self, actions.result())
    }

    def hasAnyActive: Boolean = providers.exists(_.isInstanceOf[ProviderState.Active])

    /** ST6: lower-priority active sessions whose symbols overlap. */
    def computeLowerPriorityOverlaps(higherId: Int, symbols: Set[String]): Seq[Int] =
      ((higherId + 1) until providers.length).filter { j =>
        providers(j) match {
          case ProviderState.Active(ss) => ss.exists(symbols.contains)
          case _                        => false
        }
      }

    private def handleProviderActivated(id: Int, symbols: Set[String]): (Supervisor, List[Action]) = {
      val fromCooldown = providers(id) == ProviderState.IdleFromCooldown
      val nextBackoff = if (fromCooldown) backoff.minMs else backoffMs
      val nextStart = (id + 1) % providers.length
      val next = copy(
        providers = providers.updated(id, ProviderState.Active(symbols)),
        backoffMs = nextBackoff,
        startIndex = nextStart,
        scanCursor = nextStart,
        roundExhausted = false)
      val preempt = next.computeLowerPriorityOverlaps(id, symbols)
      val actions = (if (preempt.nonEmpty) List(PreemptSessions(preempt)) else Nil) :+
        ScheduleBackoffTick(next.backoffMs)
      (next, actions)
    }

    private def advanceScanCursorForFailure(id: Int): Supervisor = {
      val nextCursor = (id + 1) % providers.length
      copy(
        providers = providers.updated(id, ProviderState.InCooldown),
        scanCursor = nextCursor,
        roundExhausted = nextCursor == startIndex || roundExhausted)
    }

    private def handleStartupFailure(
        id: Int, error: BorsaError, acc: List[BorsaError]): (Supervisor, List[Action]) = {
      val errs = acc :+ error
      val next = advanceScanCursorForFailure(id)
      if (!next.hasAnyActive && next.roundExhausted)
        (next.copy(phase = Phase.Terminated),
         List(NotifyInitial(Left(Errors.collapseStream(errs, capability)))))
      else
        (next.copy(phase = Phase.Startup(errs)), Nil)
    }

    private def handleBackoffTick(): (Supervisor, List[Action]) = {
      val cleared = providers.map {
        case ProviderState.InCooldown => ProviderState.IdleFromCooldown
        case s                        => s
      }
      var self = copy(providers = cleared)
      if (attemptedSinceLastTick) {
        if (self.hasAnyActive) self = self.increaseBackoff
        else {
          if (self.roundExhausted) phase match {
            case Phase.Startup(acc) =>
              return (self.copy(phase = Phase.Terminated),
                List(NotifyInitial(Left(Errors.collapseStream(acc, capability)))))
            case _ => ()
          }
          self = self.increaseBackoff.copy(startIndex = 0)
        }
      }
      val next = self.copy(
        attemptedSinceLastTick = false,
        scanCursor = self.startIndex,
        roundExhausted = false)
      (next, List(ScheduleBackoffTick(next.backoffMs)))
    }

    private def increaseBackoff: Supervisor =
      copy(backoffMs = math.min(backoffMs * backoff.factor, backoff.maxMs))
  }
}
