package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Errors.BorsaError

/** Production [[StreamController.SessionRunner]]: interprets supervisor
  * actions as Structured Streaming QUERY lifecycle — the seam
  * StreamController documents as "production impl = StreamingQuery
  * management" (reference session tasks:
  * borsa/src/router/streaming/session.rs).
  *
  * One provider session = one streaming query: source (factory-provided —
  * Kafka/socket in production, MemoryStream in tests) → ST9 allow-filter →
  * sink. Fan-in happens AT THE SINK (a shared table/topic/buffer), because
  * sessions start and stop dynamically under failover; the plan-level
  * union (ST10 `MonotonicGate.multiplex`) covers static composition. The
  * ST8 monotonic gate belongs downstream of the shared sink so its
  * per-symbol state survives provider failover.
  *
  * Sessions are keyed by (chain, provider): ST3 sharding may place the
  * same provider in several failover chains, and each chain's session is
  * an independent query — [[StreamController.SessionRunner.forChain]]
  * returns the chain-scoped view, so one chain's StopAll/AwaitAll never
  * touches another chain's healthy sessions.
  *
  * `allowFilter` keys the ST9 filter: quote/candle feeds use the default
  * symbol-keyed filter; option feeds pass
  * [[OptionStream.allowUnderlyings]] (their rows key by `underlying`).
  */
final class QuerySessionRunner(
    sourceFor: (Int, Seq[String]) => Either[BorsaError, DataFrame],
    startQuery: (Int, DataFrame) => StreamingQuery,
    allowFilter: (DataFrame, Set[String]) => DataFrame = MonotonicGate.allowSetFilter)
  extends StreamController.SessionRunner {

  private val active = TrieMap.empty[(Int, Int), StreamingQuery]

  private def startIn(chain: Int, id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
    sourceFor(id, symbols).flatMap { df =>
      Try(startQuery(id, allowFilter(df, symbols.toSet))) match {
        case Success(q) =>
          // idempotent start: the FSM may re-elect a provider without an
          // intervening Stop (restart after an externally-reported failure
          // while the old query thread is still alive) — the displaced
          // query must be stopped or it keeps writing to the shared sink
          active.put((chain, id), q).foreach(old => Try(old.stop()))
          Right(())
        case Failure(e) =>
          Left(BorsaError.Connector(s"provider-$id",
            BorsaError.Other(s"query start failed: ${e.getMessage}")))
      }
    }

  /** Idempotent: stopping an unknown/already-stopped session is a no-op
    * (the FSM may preempt a session that failed on its own).
    */
  private def stopIn(chain: Int, id: Int): Unit =
    active.remove((chain, id)).foreach(q => Try(q.stop()))

  private def awaitChain(chain: Int): Unit =
    active.keys.filter(_._1 == chain).toSeq.foreach { case (c, i) => stopIn(c, i) }

  // direct use (no sharding) = chain 0
  def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = startIn(0, id, symbols)
  def stop(id: Int): Unit = stopIn(0, id)
  override def awaitStopped(): Unit = awaitChain(0)

  override def forChain(chain: Int): StreamController.SessionRunner =
    new StreamController.SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
        startIn(chain, id, symbols)
      def stop(id: Int): Unit = stopIn(chain, id)
      override def awaitStopped(): Unit = awaitChain(chain)
      override def forChain(other: Int): StreamController.SessionRunner =
        QuerySessionRunner.this.forChain(other)
    }

  /** Live queries by (chain, provider) (diagnostics / tests). */
  def activeQueries: Map[(Int, Int), StreamingQuery] = active.toMap
}
