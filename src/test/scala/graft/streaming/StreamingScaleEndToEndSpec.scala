package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.streaming.MonotonicGate.Update
import graft.tables.Tables

/** Streaming e2e at BENCH scale: the full sf0.1 events feed (100k updates)
  * through the production data plane — two provider sessions pushing into
  * bounded DSv2 buffers → multiplex (ST10) → stateful monotonic gate (ST8)
  * — must emit exactly what the batch replay (qi_st8_gate's oracle form)
  * computes over the same feed.
  *
  * This is the claim the small-fixture specs can't make: micro-batch
  * boundaries fall wherever the pump puts them (dozens of batches at this
  * volume), offset-commit trims recycle the buffers many times over, and
  * the gate's per-symbol state must carry across all of it byte-identically.
  *
  * The pump pushes in rounds sized WELL below capacity. A source's offsets
  * are committed when the NEXT batch is constructed, and a batch is only
  * constructed when new data arrives — so a producer that fills a buffer
  * to the brim after the engine has already processed (but not yet
  * committed) its contents deadlocks: push blocks on a full buffer, the
  * engine sees no new data and never commits. That is real backpressure
  * semantics, not a bug — a session feed must keep headroom of one
  * in-flight batch, which is what the round size guarantees here (the
  * blocking/reject path itself is covered by ConnectorStreamSourceSpec).
  */
class StreamingScaleEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.1"

  test("sf0.1 feed through DSv2 buffers + multiplex + gate == batch replay") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir not present")

    val ticks = Tables.ticks(spark, sfDir)
      .select(col("symbol"), col("arrival"), col("secs").as("ts"))

    // the feed in arrival order; each symbol is pinned to one of two
    // provider sessions (disjoint allow-sets, like the supervisor assigns)
    val feed = ticks.as[Update].collect().sortBy(_.arrival)
    def shard(sym: String): Int = math.floorMod(sym.hashCode, 2)
    val bufNames = Seq("scale-p0", "scale-p1")
    // capacity = 2 rounds + slack: one round in flight (uncommitted) plus
    // one being pushed can never fill a buffer, even if the symbol-hash
    // shard sends a whole round to one side
    val round = 8192
    val buffers = bufNames.map(n => StreamBuffer.register(n, capacity = 3 * round))

    val out = new ConcurrentLinkedQueue[Update]()
    val gated = MonotonicGate.streamingGate(
      MonotonicGate.multiplex(bufNames.map(ConnectorStreamSource.readStream(spark, _)))
        .as[Update],
      stateTtlMs = 0)
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Update], _: Long) =>
        batch.collect().foreach(out.add)
      }
      .start()
    try {
      feed.grouped(round).foreach { rows =>
        rows.foreach { u =>
          assert(buffers(shard(u.symbol)).push(u), s"buffer full despite headroom at $u")
        }
        q.processAllAvailable()
      }
      q.processAllAvailable()
      assert(buffers.forall(_.dropped == 0))
      // the pump recycled each buffer many times over: commits must have
      // trimmed consumed prefixes (feed >> capacity would overflow otherwise)
      assert(buffers.map(_.earliest).sum > 0, "offset commits never trimmed the buffers")

      val streamed = out.toArray(Array.empty[Update]).sortBy(u => (u.symbol, u.arrival)).toSeq
      val replayed = MonotonicGate.batchReplay(ticks).as[Update]
        .collect().sortBy(u => (u.symbol, u.arrival)).toSeq
      assert(streamed.size == replayed.size,
        s"streamed ${streamed.size} rows, batch replay ${replayed.size}")
      assert(streamed == replayed, "streaming gate diverged from the batch replay oracle")

      // third witness: the ported reference model over the same feed order
      val model = MonotonicGate.referenceModel(feed).sortBy(u => (u.symbol, u.arrival))
      assert(streamed == model, "streaming gate diverged from the reference model")
    } finally {
      q.stop()
      bufNames.foreach(StreamBuffer.unregister)
    }
  }
}
