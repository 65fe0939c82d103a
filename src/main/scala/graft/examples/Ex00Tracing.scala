package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.{Connector, MockConnector, WrappedConnector}
import graft.core.Errors.BorsaError
import graft.core.Model._

/** Tracing analog (reference: borsa/examples/00_tracing.rs — a
  * `tracing_subscriber` with span ENTER/EXIT events around quote, history
  * and search). The reference instruments its tokio control plane; the
  * Spark-native analog instruments BOTH planes:
  *
  *  - control plane: a [[WrappedConnector]] decorator records an
  *    enter/exit line per capability call — one `wrap` override covers
  *    every verb, so no call can dodge the trace (the same guarantee the
  *    middleware stack relies on);
  *  - data plane: a `SparkListener` counts the Spark jobs the history
  *    pipeline actually submits (the Spark equivalent of span events on
  *    the execution engine).
  */
object Ex00Tracing extends Example {
  val name = "00 tracing"

  /** Span-style tracing middleware: enter/exit with outcome per call. */
  final class TracingConnector(val inner: Connector,
      log: scala.collection.mutable.Buffer[String]) extends WrappedConnector {
    protected def wrap[V](capability: String, key: Any)(
        load: => Either[BorsaError, V]): Either[BorsaError, V] = {
      log += s"ENTER $capability [${inner.name}]"
      val out = load
      log += s"EXIT  $capability [${inner.name}] ${if (out.isRight) "ok" else "err"}"
      out
    }
  }

  def run(spark: SparkSession): Seq[String] = {
    val trace = scala.collection.mutable.Buffer.empty[String]
    val g = new Graft(spark, Seq(new TracingConnector(new MockConnector("mock"), trace)))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
      val quote = g.quote(aapl)
      val hist = g.history(aapl,
        HistoryRequest(Interval.D1, Some(1704067200L), Some(1704067200L + 10 * 86400), None))
      val histRows = hist.map(_.candles.count())
      val found = g.search("Apple")
      // listener events are delivered asynchronously; poll briefly (the
      // actions above already ran, so events are in flight, not pending)
      val deadline = System.nanoTime() + 2000000000L
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      trace.toSeq ++ Seq(
        s"quote:   ${if (quote.isRight) "ok" else s"err ${quote.left.toOption.get}"}",
        s"history: ${histRows.map(n => s"$n candles").getOrElse("err")}",
        s"search:  ${found.map(r => s"${r.payload.size} results").getOrElse("err")}",
        s"spark jobs observed: ${jobs.get()} (data plane spans)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
