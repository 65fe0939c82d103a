package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.streaming.MonotonicGate.Update
import graft.tables.Tables

/** Streaming ingestion dedup: the sf0.01 feed delivered TWICE (every update
  * re-pushed immediately, the reconnect re-delivery shape) through the DSv2
  * source must come out of `dropDuplicatesWithinWatermark` as exactly the
  * distinct feed — byte-equal to the batch distinct over the same rows —
  * while keeping bounded per-key state.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("doubled sf0.01 feed dedups to the batch distinct (bounded state)") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir not present")
    val ticks = Tables.ticks(spark, sfDir)
      .select(col("symbol"), col("arrival"), col("secs").as("ts"))
    // arrival-ordered so the watermark (event time = arrival) is monotone;
    // each update immediately re-delivered — the duplicate is always within
    // the watermark delay of its twin
    val feed = ticks.as[Update].collect().sortBy(_.arrival).flatMap(u => Seq(u, u))

    val buf = StreamBuffer.register("dedup-scale", capacity = 8192)
    val out = new ConcurrentLinkedQueue[Update]()
    val q = StreamDedup.dedupWithinWatermark(
        ConnectorStreamSource.readStream(spark, "dedup-scale"))
      .as[Update]
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Update], _: Long) =>
        batch.collect().foreach(out.add)
      }
      .start()
    try {
      feed.grouped(4096).foreach { rows =>
        rows.foreach(u => assert(buf.push(u), "buffer full despite headroom"))
        q.processAllAvailable()
      }
      q.processAllAvailable()
      val streamed = out.toArray(Array.empty[Update]).sortBy(u => (u.symbol, u.arrival)).toSeq
      val want = ticks.distinct().as[Update].collect().sortBy(u => (u.symbol, u.arrival)).toSeq
      val missing = want.toSet -- streamed.toSet
      val extra = streamed.toSet -- want.toSet
      val dups = streamed.groupBy(identity).collect { case (u, g) if g.size > 1 => u }.toSeq
      assert(missing.isEmpty && extra.isEmpty && dups.isEmpty && streamed.size == want.size,
        s"streamed ${streamed.size} vs ${want.size}; missing=${missing.take(3)} " +
          s"extra=${extra.take(3)} dups=${dups.take(3)}")
    } finally {
      q.stop()
      StreamBuffer.unregister("dedup-scale")
    }
  }

  test("dedupedGate: duplicates AND ts regressions die in one enforced composition") {
    // feed: every update delivered twice (reconnect shape) PLUS stale
    // out-of-order regressions (ts below the symbol's running max) —
    // dedup alone passes the regressions, the gate alone passes the
    // duplicates; the composition must emit the reference model of the
    // distinct feed
    val base = Seq(
      Update("A", 1L, 100L), Update("A", 2L, 105L),
      Update("A", 3L, 90L), // regression: below A's max
      Update("A", 4L, 105L), // equal ts: allowed by the gate contract
      Update("B", 5L, 50L), Update("B", 6L, 40L), // regression on B
      Update("B", 7L, 60L))
    val feed = base.flatMap(u => Seq(u, u))

    val buf = StreamBuffer.register("dedup-gate", capacity = 1024)
    val out = new ConcurrentLinkedQueue[Update]()
    val q = StreamDedup.dedupedGate(
        ConnectorStreamSource.readStream(spark, "dedup-gate").as[Update],
        stateTtlMs = 0L)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Update], _: Long) =>
        batch.collect().foreach(out.add)
      }
      .start()
    try {
      feed.foreach(u => assert(buf.push(u)))
      q.processAllAvailable()
      val streamed = out.toArray(Array.empty[Update]).sortBy(_.arrival).toSeq
      val want = MonotonicGate.referenceModel(base)
      assert(streamed == want,
        s"composition must equal referenceModel(distinct feed):\ngot  $streamed\nwant $want")
    } finally {
      q.stop()
      StreamBuffer.unregister("dedup-gate")
    }
  }
}
