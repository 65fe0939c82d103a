package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{Graft, SparkSpec}
import graft.connector.MockConnector
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.routing.Policy
import graft.streaming.CandleAggregator.Tick
import graft.streaming.StreamController._

/** Candle streaming end-to-end (VERDICT r2 "Next round" #7): the
  * `streamCandles` façade plans/fails over per chain (planner.rs:173-243,
  * stream.rs:127-288), and the bar data plane carries the CandleUpdate
  * is_final contract (connector.rs:270-288) — intermediate update-mode
  * emissions then exactly one final close per bucket.
  */
class CandleStreamEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
  private val msft = Instrument(Symbol("MSFT"), None, AssetKind.Equity)

  private def candleConnector(n: String) =
    new MockConnector(n, MockConnector.Script(extraCapabilities = Set("stream-candles")))

  test("streamCandles fails over within the chain when the primary cannot start") {
    val g = new Graft(spark, Seq(candleConnector("alpha"), candleConnector("beta")))
    var started = List.empty[(Int, Seq[String])]
    var live = Set.empty[Int]
    val runner = new SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        started ::= (id, symbols)
        if (id == 0) Left(BorsaError.Data("alpha is down")) else { live += id; Right(()) }
      }
      def stop(id: Int): Unit = live -= id
    }
    val Right(handle) = g.streamCandles(Seq(aapl), runner)
    assert(started.reverse.map(_._1) == List(0, 1), "alpha attempted first, then failover to beta")
    assert(live == Set(1))
    handle.stop()
    assert(live.isEmpty)
  }

  test("streamCandles quote-capable-only connectors are not eligible") {
    val quotesOnly = new MockConnector("q",
      MockConnector.Script(extraCapabilities = Set("stream-quotes")))
    val runner = new SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = Right(())
      def stop(id: Int): Unit = ()
    }
    new Graft(spark, Seq(quotesOnly)).streamCandles(Seq(aapl), runner) match {
      case Left(BorsaError.Unsupported(_)) => ()
      case other => fail(s"expected Unsupported, got $other")
    }
  }

  test("explicit per-symbol ranks shard one supervisor per primary chain through the façade (ST3)") {
    // AAPL prefers alpha, MSFT prefers beta → two primaries → two chains
    val policy = Policy.ProviderPolicy()
      .withRule(Policy.Selector(symbol = Some(Symbol("AAPL"))), Seq("alpha", "beta"))
      .withRule(Policy.Selector(symbol = Some(Symbol("MSFT"))), Seq("beta", "alpha"))
    val g = new Graft(spark, Seq(candleConnector("alpha"), candleConnector("beta")), policy)
    var started = List.empty[(Int, Seq[String])]
    val runner = new SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        started ::= (id, symbols); Right(())
      }
      def stop(id: Int): Unit = ()
    }
    val Right(handle) = g.streamCandles(Seq(aapl, msft), runner)
    // each chain starts its own primary with exactly its elected symbols
    assert(started.toSet == Set((0, Seq("AAPL")), (1, Seq("MSFT"))),
      s"expected per-chain primaries, got $started")
    handle.stop()
  }

  test("full production path: 3 sharded chains over overlapping providers drive real chain-scoped queries") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.MonotonicGate.Update
    val symbols = Seq("AAPL", "MSFT", "GOOG")
    val providers = Seq("alpha", "beta", "gamma")
    // each symbol elects a different primary; every chain contains all
    // three providers, so providers overlap across chains
    val policy = symbols.zip(Seq(
      Seq("alpha", "beta", "gamma"),
      Seq("beta", "gamma", "alpha"),
      Seq("gamma", "alpha", "beta")))
      .foldLeft(Policy.ProviderPolicy()) { case (p, (s, order)) =>
        p.withRule(Policy.Selector(symbol = Some(Symbol(s))), order)
      }
    val g = new Graft(spark, providers.map(candleConnector), policy)
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => Right(MemoryStream[Update].toDF()),
      startQuery = (_, df) => df.writeStream.format("noop").start())
    val insts = symbols.map(s => Instrument(Symbol(s), None, AssetKind.Equity))
    val Right(handle) = g.streamCandles(insts, runner)
    // three chains, each with its own live session on its elected primary
    // (global connector ids 0/1/2), scoped per chain
    assert(runner.activeQueries.size == 3)
    assert(runner.activeQueries.keys.map(_._1).toSet.size == 3, "one session per chain")
    assert(runner.activeQueries.keys.map(_._2).toSet == Set(0, 1, 2),
      "each chain runs a DIFFERENT primary")
    assert(runner.activeQueries.values.forall(_.isActive))
    handle.stop()
    assert(runner.activeQueries.isEmpty, "composite stop tears down every chain's query")
  }

  test("bar feed: is_final=false intermediate updates, then exactly one is_final=true close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val updatesQ = CandleAggregator.updates(input.toDF())
      .writeStream.format("memory").queryName("bars_updates").outputMode("update").start()
    val finalsQ = CandleAggregator.finals(input.toDF())
      .writeStream.format("memory").queryName("bars_finals").outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      def dec(d: Double) = new java.math.BigDecimal(d)

      // open the [0,60) bar with two ticks → two intermediate updates
      input.addData(Seq(Tick("AAPL", ts(5), dec(100.0), 10L)))
      updatesQ.processAllAvailable(); finalsQ.processAllAvailable()
      input.addData(Seq(Tick("AAPL", ts(20), dec(105.0), 5L)))
      updatesQ.processAllAvailable(); finalsQ.processAllAvailable()

      val interm = spark.table("bars_updates")
        .where("bucket_ts = 0").collect()
      assert(interm.length == 2, "two update-mode re-emissions of the open bar")
      assert(interm.forall(!_.getAs[Boolean]("is_final")))
      assert(spark.table("bars_finals").count() == 0, "bar still open: no final yet")

      // a tick far past the watermark horizon closes [0,60)
      input.addData(Seq(Tick("AAPL", ts(200), dec(90.0), 1L)))
      updatesQ.processAllAvailable(); finalsQ.processAllAvailable()

      val fin = spark.table("bars_finals").where("bucket_ts = 0").collect()
      assert(fin.length == 1, "exactly one is_final=true close per bucket")
      val bar = fin.head
      assert(bar.getAs[Boolean]("is_final"))
      assert(BigDecimal(bar.getAs[java.math.BigDecimal]("open")) == BigDecimal(100.0))
      assert(BigDecimal(bar.getAs[java.math.BigDecimal]("high")) == BigDecimal(105.0))
      assert(BigDecimal(bar.getAs[java.math.BigDecimal]("close")) == BigDecimal(105.0))
      assert(bar.getAs[Long]("volume") == 15L)
      // the final bar equals the batch-kernel replay over the same ticks
      val replay = CandleAggregator.candles(
        Seq(Tick("AAPL", ts(5), dec(100.0), 10L), Tick("AAPL", ts(20), dec(105.0), 5L))
          .toDF()).where("bucket_ts = 0").collect().head
      assert(BigDecimal(replay.getAs[java.math.BigDecimal]("open")) ==
        BigDecimal(bar.getAs[java.math.BigDecimal]("open")))
      assert(replay.getAs[Long]("volume") == bar.getAs[Long]("volume"))
    } finally { updatesQ.stop(); finalsQ.stop() }
  }
}
