package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StreamAsOf._
import graft.tables.Tables

/** Streaming backward as-of enrichment must be INDISTINGUISHABLE from the
  * batch `AsOfJoin.backward` replay of the same events (the ST8
  * equivalence discipline applied to the flagship batch operator) — across
  * arbitrary micro-batch boundaries, at sf0.01 scale, and under the gated
  * composition.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(
      events: Seq[AsOfEvent],
      chunk: Int,
      tolerance: Option[Long],
      queryName: String): Seq[Enriched] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfEvent]
    val q = asOfEnrich(input.toDS(), tolerance, stateTtlMs = 0)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      events.grouped(chunk).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(queryName).as[Enriched].collect().toSeq
    } finally q.stop()
  }

  private def asBatchRows(out: Seq[Enriched]): Set[(String, Long, Long, Option[Long], Option[Long])] =
    out.map(e => (e.symbol, e.ts, e.value, e.matchedTs, e.matchedValue)).toSet

  private def replayRows(events: Seq[AsOfEvent], tolerance: Option[Long]) =
    batchReplay(events, spark, tolerance).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet

  /** Per-symbol ts-ordered feed (the operator's contract): global sort by
    * (ts, quotes-first) orders every symbol's sub-sequence correctly.
    */
  private def ordered(events: Seq[AsOfEvent]): Seq[AsOfEvent] =
    events.sortBy(e => (e.ts, !e.isQuote, e.symbol, e.value))

  test("property: streaming == batch replay across random fixtures and chunkings") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val syms = Seq("A", "B", "C")
      val evs = ordered(
        (0 until 300).map { i =>
          AsOfEvent(syms(rnd.nextInt(3)), rnd.nextInt(500).toLong,
            rnd.nextBoolean(), i.toLong)
        }.groupBy(e => (e.symbol, e.ts, e.isQuote)).map(_._2.head).toSeq) // unique quotes per (sym, ts)
      for (tol <- Seq(None, Some(40L)); chunk <- Seq(17, 1000)) {
        val got = asBatchRows(runStream(evs, chunk, tol, s"asof_p_${seed}_${chunk}_${tol.isDefined}"))
        val want = replayRows(evs, tol)
        assert(got == want, s"seed=$seed tol=$tol chunk=$chunk: " +
          s"only-got=${(got -- want).take(3)} only-want=${(want -- got).take(3)}")
      }
    }
  }

  test("sf0.01 feed: streaming enrichment == qi_asof_price-shaped batch join") {
    assume(new java.io.File("/root/testdata/sf0.01/events.parquet").exists())
    val t = Tables.ticks(spark, "/root/testdata/sf0.01")
    val quotes = t.filter(col("provider") === "prov_a")
      .groupBy("symbol", "secs")
      .agg(max_by(col("price_micros"), col("arrival")).as("v"))
      .select(col("symbol"), col("secs"), lit(true).as("isQuote"), col("v"))
    val trades = t.filter(col("event_type") === "purchase")
      .select(col("symbol"), col("secs"), lit(false).as("isQuote"),
        col("price_micros").as("v"))
    val evs = ordered(quotes.unionByName(trades)
      .collect().map(r => AsOfEvent(r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toSeq)
    val got = asBatchRows(runStream(evs, 5000, Some(3600L), "asof_sf"))
    val want = replayRows(evs, Some(3600L))
    assert(got.size == want.size && got == want,
      s"sf0.01 mismatch: ${got.size} vs ${want.size}; " +
        s"only-got=${(got -- want).take(3)} only-want=${(want -- got).take(3)}")
  }

  test("gated composition: out-of-order events on either side die before the state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfEvent]
    // arrival = index; the ts=50 quote and ts=60 trade arrive AFTER the
    // symbol has seen ts=100 — the gate must drop both (never a stale match)
    val evs = Seq(
      AsOfEvent("A", 100L, true, 7L),   // quote ts=100
      AsOfEvent("A", 50L, true, 666L),  // late quote — dropped by gate
      AsOfEvent("A", 60L, false, 1L),   // late trade — dropped by gate
      AsOfEvent("A", 120L, false, 2L))  // matches the ts=100 quote
    val arrival = evs.zipWithIndex.map { case (e, i) => e -> i.toLong }.toMap
    val q = gatedAsOfEnrich(input.toDS(), arrival, tolerance = None, stateTtlMs = 0)
      .writeStream.format("memory").queryName("asof_gated")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(evs); q.processAllAvailable()
      val got = spark.table("asof_gated").as[Enriched].collect().toSeq
      assert(got == Seq(Enriched("A", 120L, 2L, Some(100L), Some(7L))), s"got $got")
    } finally q.stop()
  }

  test("TTL kernel: trades-only batch on fresh state must not throw; quote arms, timeout reaps") {
    // regression: setTimeoutDuration on UNDEFINED state (no quote seen yet)
    // throws at runtime — masked by the equivalence tests' stateTtlMs = 0.
    // TestGroupState drives the kernel directly (a TTL-armed streaming
    // query never quiesces under processAllAvailable/AvailableNow).
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def fresh(hasTimedOut: Boolean = false, st: Optional[QuoteState] = Optional.empty()) =
      TestGroupState.create[QuoteState](st, GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long](), hasTimedOut)

    // trades-only, no prior state: emits unmatched, must NOT arm a timeout
    val s1 = fresh()
    val out1 = StreamAsOf.processGroup(None, 60000L)(
      "FRESH", Iterator(AsOfEvent("FRESH", 10L, false, 1L)), s1).toList
    assert(out1 == List(Enriched("FRESH", 10L, 1L, None, None)))
    assert(!s1.exists && !s1.getTimeoutTimestampMs.isPresent)

    // a quote arrives: state updates AND the TTL arms
    val s2 = fresh()
    StreamAsOf.processGroup(None, 60000L)(
      "FRESH", Iterator(AsOfEvent("FRESH", 20L, true, 7L)), s2).toList
    assert(s2.get == QuoteState(20L, 7L) && s2.getTimeoutTimestampMs.isPresent)

    // timeout firing reaps the prevailing quote
    val s3 = fresh(hasTimedOut = true, st = Optional.of(QuoteState(20L, 7L)))
    val out3 = StreamAsOf.processGroup(None, 60000L)("FRESH", Iterator.empty, s3).toList
    assert(out3.isEmpty && s3.isRemoved)
  }

  test("tolerance bounds the match; equal-ts quote and trade match in any batch split") {
    // quote and trade share ts=10 but arrive in DIFFERENT micro-batches
    // with the trade first in its batch — the in-batch (ts, quotes-first)
    // sort plus cross-batch state must still produce the inclusive match
    val evs = Seq(
      AsOfEvent("A", 10L, true, 5L), AsOfEvent("A", 10L, false, 1L),
      AsOfEvent("A", 200L, false, 2L)) // 190 past the quote: outside tol=50
    val got = asBatchRows(runStream(evs, 1, Some(50L), "asof_tol"))
    assert(got == Set(
      ("A", 10L, 1L, Some(10L), Some(5L)),
      ("A", 200L, 2L, None, None)), s"got $got")
  }
}
