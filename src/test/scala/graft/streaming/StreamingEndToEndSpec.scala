package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Errors.BorsaError
import graft.streaming.MonotonicGate.Update
import graft.streaming.StreamController._
import graft.streaming.SupervisorFsm._

/** §3.3 end-to-end: supervisor-managed provider failover over REAL
  * Structured Streaming sessions, with the per-session allow-filter (ST9),
  * monotonic gate (ST8) and fan-in multiplex (ST10) in the query plan.
  *
  * Two providers are MemoryStreams. Provider 0 serves first, its session
  * ends (SessionEnded → cooldown), the supervisor fails over to provider 1;
  * updates from both phases flow through one gated multiplexed sink and
  * respect per-symbol monotonicity across the failover boundary.
  */
class StreamingEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("provider failover with gated multiplexed output") {
    implicit val sqlCtx = spark.sqlContext
    val provider0 = MemoryStream[Update]
    val provider1 = MemoryStream[Update]

    // one multiplexed, allow-filtered, monotonic-gated flow (the data plane
    // is independent of which session is live — ST9/ST8/ST10 compose)
    val multiplexed = MonotonicGate.multiplex(Seq(
      MonotonicGate.allowSetFilter(provider0.toDF(), Set("A", "B")),
      MonotonicGate.allowSetFilter(provider1.toDF(), Set("A", "B"))))
    val gated = MonotonicGate.streamingGate(multiplexed.as[Update], stateTtlMs = 0)
    val query = gated.writeStream.format("memory").queryName("e2e_out")
      .outputMode("append").start()

    // control plane: scripted runner records which provider is live
    var live = Set.empty[Int]
    val runner = new SessionRunner {
      def start(id: Int, symbols: Seq[String]): Either[BorsaError, Unit] = {
        live += id; Right(())
      }
      def stop(id: Int): Unit = live -= id
    }
    val supervisor = Supervisor(
      providers = Vector.fill(2)(ProviderState.Idle),
      providerAllow = Vector.fill(2)(Set("A", "B")),
      providerCanStream = Vector.fill(2)(true),
      requiredSymbols = Set("A", "B"),
      capability = "stream-quotes")
    val controller = new Controller(supervisor, runner, (_, _) => ())

    try {
      val Right(handle) = controller.awaitStartup()
      assert(live == Set(0)) // provider 0 is the primary session

      // phase 1: provider 0 emits (with one out-of-order tick to drop)
      provider0.addData(Seq(
        Update("A", 1, 100), Update("A", 2, 105), Update("A", 3, 101), // ts 101 < 105 → dropped
        Update("B", 4, 50), Update("X", 5, 1))) // X outside allow-set → dropped
      query.processAllAvailable()

      // provider 0's session ends → cooldown; tick clears it and retries,
      // but meanwhile the supervisor should fail over to provider 1
      controller.enqueue(Event.SessionEnded(0, Set("A", "B")))
      controller.enqueue(Event.BackoffTick)
      assert(live.contains(1) || live.contains(0)) // a session is (re)starting
      assert(controller.currentState.providers.exists {
        case ProviderState.Connecting(_) | ProviderState.Active(_) => true
        case _ => false
      })

      // phase 2: provider 1 emits; gate state carries across the failover
      provider1.addData(Seq(
        Update("A", 6, 103), // below A's max 105 → dropped even after failover
        Update("A", 7, 110), Update("B", 8, 55)))
      query.processAllAvailable()

      val out = spark.table("e2e_out").as[Update].collect().toSeq.sortBy(_.arrival)
      assert(out.map(_.arrival) == Seq(1L, 2L, 4L, 7L, 8L))
      handle.stop()
      assert(live.isEmpty) // ST12: stop tears every session down
    } finally query.stop()
  }
}
