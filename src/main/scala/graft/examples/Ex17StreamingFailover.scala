package graft.examples

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.routing.Policy
import graft.streaming.StreamController

/** Quote streaming with provider failover (reference:
  * borsa/examples/17_streaming.rs — start a stream, consume, stop
  * gracefully).
  *
  * Two stream-capable providers; the PRIMARY's session fails to start, and
  * the supervisor FSM (ST4) fails over to the backup — the stream still
  * comes up and `handle.stop()` tears it down gracefully (ST12). The
  * session runner is scripted (in production it starts one Structured
  * Streaming query per provider over
  * [[graft.streaming.ConnectorStreamSource]]).
  */
object Ex17StreamingFailover extends Example {
  val name = "17 streaming failover"

  def run(spark: SparkSession): Seq[String] = {
    def streamer(n: String) = new MockConnector(n,
      MockConnector.Script(extraCapabilities = Set("stream-quotes")))
    val g = new Graft(spark, Seq(streamer("alpha"), streamer("beta")),
      Policy.ProviderPolicy().withGlobal(Seq("alpha", "beta")))

    val log = new ConcurrentLinkedQueue[String]()
    val runner = new StreamController.SessionRunner {
      def start(id: Int, symbols: Seq[String]) =
        if (id == 0) { // primary (alpha) is down
          log.add(s"session start: provider $id -> REFUSED")
          Left(graft.core.Errors.BorsaError.Connector("alpha",
            graft.core.Errors.BorsaError.Other("feed down")))
        } else {
          log.add(s"session start: provider $id -> ${symbols.sorted.mkString(",")}")
          Right(())
        }
      def stop(id: Int): Unit = log.add(s"session stop: provider $id")
    }

    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    g.streamQuotes(Seq(aapl), runner) match {
      case Right(handle) =>
        log.add("stream up (failed over to backup)")
        handle.stop()
        log.add("stream stopped")
        log.toArray(Array.empty[String]).toSeq
      case Left(e) =>
        (log.toArray(Array.empty[String]) :+ s"stream failed to start: $e").toSeq
    }
  }
}
