package graft.streaming

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.streaming.MonotonicGate.Update

/** The DSv2 connector-feed source: micro-batch offsets over the bounded
  * push buffer, commit-trims freeing producer capacity, slow-consumer
  * rejection, and composition with the ST8 gate.
  */
class ConnectorStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches deliver pushed updates exactly once; commit trims the buffer") {
    val buf = StreamBuffer.register("css-basic", capacity = 16)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = ConnectorStreamSource.readStream(spark, "css-basic")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.collect().foreach(r =>
          sink.add((r.getAs[String]("symbol"), r.getAs[Long]("arrival"))))
      }
      .start()
    try {
      assert(buf.push(Update("A", 1, 100)) && buf.push(Update("B", 2, 50)))
      q.processAllAvailable()
      assert(sink.size() == 2)
      // a second batch carries only the NEW rows — no replay of the prefix
      assert(buf.push(Update("A", 3, 101)))
      q.processAllAvailable()
      val rows = sink.toArray(Array.empty[(String, Long)]).sortBy(_._2)
      assert(rows.map(_._2).toSeq == Seq(1L, 2L, 3L), "replayed or lost rows")
      // the engine commits a batch's offsets on the following cycle: by the
      // end of batch 2, batch 1's prefix must be trimmed from the buffer
      assert(buf.earliest >= 2, s"commit never freed the consumed prefix (earliest=${buf.earliest})")
    } finally q.stop()
  }

  test("bounded buffer: a slow consumer rejects (counted) instead of growing unboundedly; commit unblocks") {
    val buf = StreamBuffer.register("css-slow", capacity = 4)
    (1 to 4).foreach(i => assert(buf.push(Update("S", i.toLong, i.toLong))))
    // full: a push with no wait budget is rejected and counted
    assert(!buf.push(Update("S", 5, 5)))
    assert(!buf.push(Update("S", 6, 6), timeoutMs = 20))
    assert(buf.dropped == 2)
    // consumer catches up (commit) → capacity frees → pushes succeed again
    buf.trimTo(2)
    assert(buf.push(Update("S", 7, 7)))
    assert(buf.dropped == 2)
  }

  test("composes with the ST8 monotonic gate as a plain streaming source") {
    val buf = StreamBuffer.register("css-gate", capacity = 16)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val gated = MonotonicGate.streamingGate(
      ConnectorStreamSource.readStream(spark, "css-gate").as[Update], stateTtlMs = 0)
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Update], _: Long) =>
        batch.collect().foreach(u => sink.add(Long.box(u.arrival)))
      }
      .start()
    try {
      buf.push(Update("A", 1, 100))
      buf.push(Update("A", 2, 99)) // stale ts → gated out
      buf.push(Update("A", 3, 100)) // equal ts passes (filters.rs:44-74)
      q.processAllAvailable()
      assert(sink.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("concurrent producers: every push is delivered exactly once (contended enqueue)") {
    // capacity leaves headroom (a FULL buffer of processed-but-uncommitted
    // rows deadlocks producer vs engine — see StreamingScaleEndToEndSpec);
    // the claim here is the synchronized index assignment under contention:
    // 4 threads racing push() must yield 800 distinct rows, none lost or
    // duplicated across the micro-batch offset slices
    val buf = StreamBuffer.register("css-mprod", capacity = 4096)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = ConnectorStreamSource.readStream(spark, "css-mprod")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.collect().foreach(r => sink.add(r.getAs[Long]("arrival")))
      }
      .start()
    try {
      val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val producers = (0 until 4).map { p =>
        new Thread(() => (0 until 200).foreach { i =>
          val id = p * 1000L + i
          if (!buf.push(Update(s"P$p", id, id))) failed.set(true)
        }, s"css-mprod-$p")
      }
      producers.foreach(_.start())
      while (producers.exists(_.isAlive)) q.processAllAvailable()
      producers.foreach(_.join())
      q.processAllAvailable()
      assert(!failed.get, "no push may be rejected under headroom")
      val got = scala.jdk.CollectionConverters.CollectionHasAsScala(sink).asScala.toSeq.sorted
      val want = (for (p <- 0 until 4; i <- 0 until 200) yield p * 1000L + i).sorted
      assert(got == want, s"lost or duplicated rows: got ${got.size}, want ${want.size}")
      assert(buf.dropped == 0)
    } finally q.stop()
  }

  test("the source serves as a production sourceFor in QuerySessionRunner") {
    val buf = StreamBuffer.register("css-runner", capacity = 16)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val runner = new QuerySessionRunner(
      sourceFor = (_, _) => Right(ConnectorStreamSource.readStream(spark, "css-runner")),
      startQuery = (_, df) => df.writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.collect().foreach(r => sink.add(r.getAs[String]("symbol")))
        }
        .start())
    assert(runner.start(0, Seq("AAPL")).isRight)
    buf.push(Update("AAPL", 1, 10))
    buf.push(Update("X", 2, 11)) // outside the allow-set → filtered in-plan
    runner.activeQueries((0, 0)).processAllAvailable()
    runner.awaitStopped()
    assert(sink.toArray(Array.empty[String]).toSeq == Seq("AAPL"))
  }
}
