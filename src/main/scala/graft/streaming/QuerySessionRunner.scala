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
  */
final class QuerySessionRunner(
    sourceFor: (Int, Seq[String]) => Either[BorsaError, DataFrame],
    startQuery: (Int, DataFrame) => StreamingQuery) extends StreamController.SessionRunner {

  private val active = TrieMap.empty[Int, StreamingQuery]

  def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] =
    sourceFor(id, symbols).flatMap { df =>
      Try(startQuery(id, MonotonicGate.allowSetFilter(df, symbols.toSet))) match {
        case Success(q) =>
          active.put(id, q)
          Right(())
        case Failure(e) =>
          Left(BorsaError.Connector(s"provider-$id",
            BorsaError.Other(s"query start failed: ${e.getMessage}")))
      }
    }

  /** Idempotent: stopping an unknown/already-stopped session is a no-op
    * (the FSM may preempt a session that failed on its own).
    */
  def stop(id: Int): Unit =
    active.remove(id).foreach(q => Try(q.stop()))

  override def awaitStopped(): Unit =
    active.keys.toSeq.foreach(stop)

  /** Live queries by provider id (diagnostics / tests). */
  def activeQueries: Map[Int, StreamingQuery] = active.toMap
}
