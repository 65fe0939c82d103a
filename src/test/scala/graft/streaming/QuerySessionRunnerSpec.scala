package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Errors.BorsaError
import graft.streaming.MonotonicGate.Update
import graft.streaming.StreamController._
import graft.streaming.SupervisorFsm._

/** Supervisor failover driving REAL StreamingQuery lifecycles through the
  * production runner: queries start/stop with FSM actions, the ST9
  * allow-filter is applied per session, and fan-in happens at the shared
  * sink across the failover boundary.
  */
class QuerySessionRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("failover starts/stops real queries; shared sink accumulates across sessions") {
    implicit val sqlCtx = spark.sqlContext
    val sources = Map(0 -> MemoryStream[Update], 1 -> MemoryStream[Update])

    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    @volatile var p0Dead = false
    val runner = new QuerySessionRunner(
      sourceFor = (id, _) =>
        if (id == 0 && p0Dead) Left(BorsaError.Data("provider 0 is gone"))
        else Right(sources(id).toDF()),
      startQuery = (id, df) => df.writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.collect().foreach(r =>
            sink.add((id.toLong, r.getAs[String]("symbol"), r.getAs[Long]("arrival"))))
        }
        .start())

    val supervisor = Supervisor(
      providers = Vector.fill(2)(ProviderState.Idle),
      providerAllow = Vector.fill(2)(Set("A", "B")),
      providerCanStream = Vector.fill(2)(true),
      requiredSymbols = Set("A", "B"),
      capability = "stream-quotes")
    val controller = new Controller(supervisor, runner, (_, _) => ())
    val Right(handle) = controller.awaitStartup()
    assert(runner.activeQueries.keySet == Set((0, 0)), "primary session is a live query")

    // phase 1: provider 0 emits; X is outside the allow-set → filtered in-plan
    sources(0).addData(Seq(Update("A", 1, 100), Update("X", 2, 1), Update("B", 3, 50)))
    runner.activeQueries((0, 0)).processAllAvailable()
    assert(sink.size() == 2)

    // session 0 dies and its restart fails → the scan fails over to
    // provider 1 (the FSM retries the cleared-cooldown primary first; a
    // dead source pushes it onward)
    controller.enqueue(Event.SessionEnded(0, Set("A", "B")))
    runner.stop(0)
    p0Dead = true
    controller.enqueue(Event.BackoffTick)
    assert(runner.activeQueries.keySet == Set((0, 1)), "failover started a real query on provider 1")

    // phase 2: provider 1 emits into the SAME sink
    sources(1).addData(Seq(Update("A", 4, 110)))
    runner.activeQueries((0, 1)).processAllAvailable()

    val rows = sink.toArray(Array.empty[(Long, String, Long)]).sortBy(_._3)
    assert(rows.map(_._3).toSeq == Seq(1L, 3L, 4L))
    assert(rows.collect { case (p, _, a) if a == 4L => p }.toSeq == Seq(1L),
      "post-failover rows come from provider 1's session")

    // ST12 teardown stops every live query
    handle.stop()
    assert(runner.activeQueries.isEmpty)
  }

  test("chain-scoped views: a shared provider hosts distinct sessions per chain; stopping one chain spares the other") {
    implicit val sqlCtx = spark.sqlContext
    val srcA = MemoryStream[Update]
    val srcB = MemoryStream[Update]
    var nextSrc = Seq(srcA, srcB)
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => synchronized {
        val s = nextSrc.head; nextSrc = nextSrc.tail; Right(s.toDF())
      },
      startQuery = (_, df) => df.writeStream.format("noop").start())
    val chain0 = runner.forChain(0)
    val chain1 = runner.forChain(1)
    // SAME provider id 1 in both chains → two live queries, not one
    assert(chain0.start(1, Seq("AAPL")).isRight)
    assert(chain1.start(1, Seq("MSFT")).isRight)
    assert(runner.activeQueries.keySet == Set((0, 1), (1, 1)))
    val q1 = runner.activeQueries((1, 1))
    // chain 0 shutdown (StopAll + AwaitAll) must not touch chain 1
    chain0.stop(1)
    chain0.awaitStopped()
    assert(runner.activeQueries.keySet == Set((1, 1)))
    assert(runner.activeQueries((1, 1)).isActive && (q1 eq runner.activeQueries((1, 1))))
    chain1.awaitStopped()
    assert(runner.activeQueries.isEmpty)
  }

  test("ST12 drop: close() tears down live queries with no hang and no leaked sessions") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Update]
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => Right(src.toDF()),
      startQuery = (_, df) => df.writeStream.format("noop").start())
    val supervisor = Supervisor(
      providers = Vector.fill(1)(ProviderState.Idle),
      providerAllow = Vector.fill(1)(Set("A")),
      providerCanStream = Vector.fill(1)(true),
      requiredSymbols = Set("A"),
      capability = "stream-quotes")
    val controller = new Controller(supervisor, runner, (_, _) => ())
    val Right(handle) = controller.awaitStartup()
    assert(runner.activeQueries.nonEmpty)
    handle.close() // drop without await
    controller.awaitTerminated()
    assert(runner.activeQueries.isEmpty, "dropped handle leaked streaming queries")
  }

  test("re-electing a provider without an intervening stop displaces AND stops the old query") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Update]
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => Right(src.toDF()),
      startQuery = (_, df) => df.writeStream.format("noop").start())
    assert(runner.start(0, Seq("A")).isRight)
    val first = runner.activeQueries((0, 0))
    // restart after an externally-reported failure: FSM re-elects provider 0
    // while the old query thread is still alive — no Stop in between
    assert(runner.start(0, Seq("A")).isRight)
    val second = runner.activeQueries((0, 0))
    assert(second ne first, "re-election started a fresh query")
    assert(!first.isActive, "displaced query was stopped, not leaked")
    assert(second.isActive)
    runner.awaitStopped()
    assert(runner.activeQueries.isEmpty)
  }

  test("a source factory failure surfaces as a typed start error (FSM keeps scanning)") {
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => Left(BorsaError.Data("session unavailable")),
      startQuery = (_, _) => fail("must not be called"))
    runner.start(0, Seq("A")) match {
      case Left(BorsaError.Data(msg)) => assert(msg.contains("unavailable"))
      case other => fail(s"expected Data error, got $other")
    }
    assert(runner.activeQueries.isEmpty)
  }
}
