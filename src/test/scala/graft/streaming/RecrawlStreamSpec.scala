package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecrawlStreamSpec extends SparkSpec {
  import spark.implicits._
  import RecrawlStream.{FetchObs, RecrawlUpdate}

  test("recrawlDueStream == batch recrawlDue across splits; emissions prefix-consistent (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      FetchObs("https://a.com/x", 0L, "h0"), FetchObs("https://a.com/x", 100L, "h1"),
      FetchObs("https://a.com/x", 180L, "h1"), FetchObs("https://a.com/x", 250L, "h2"),
      FetchObs("https://b.com/y", 200L, "s"), FetchObs("https://b.com/y", 300L, "s"),
      FetchObs("https://c.com/z", 10L, "s"), FetchObs("https://c.com/z", 20L, "s"),
      FetchObs("https://d.com/w", 0L, "x0"), FetchObs("https://d.com/w", 3L, "x1"),
      FetchObs("https://d.com/w", 6L, "x2"),
      FetchObs("https://e.com/v", 100L, "s"))
    val lm = Seq(("https://b.com/y", 40L), ("https://e.com/v", 500L))
      .toDF("url", "lastmod_ts")
    // the batch twin over the same fetches is the equality target
    val want = graft.pipeline.Recrawl.recrawlDue(
        feed.toDF("url", "fetch_ts", "content_hash"), Some(lm),
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(want("https://a.com/x") == ((4L, 3L, 100L, 350L)), s"batch fixture drifted: $want")

    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Seq(Seq(12), Seq.fill(12)(1), Seq(5, 4, 3)).zipWithIndex.foreach { case (split, si) =>
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FetchObs]
        val name = s"recrawl_stream_out_$si"
        val q = RecrawlStream.recrawlDueStream(in.toDS(), Some(lm),
            defaultIntervalMs = 1000L, minIntervalMs = 50L)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          var rest = feed
          split.foreach { n =>
            val (chunk, tail) = rest.splitAt(n)
            rest = tail
            if (chunk.nonEmpty) { in.addData(chunk); q.processAllAvailable() }
          }
          val rows = spark.table(name).as[RecrawlUpdate].collect()
          // one emission per fetch
          assert(rows.length == feed.length, s"split $si: ${rows.length} emissions")
          // the LAST emission per url (highest n_fetches) == the batch row
          val last = rows.groupBy(_.url).map { case (u, rs) =>
            val r = rs.maxBy(_.n_fetches)
            u -> ((r.n_fetches, r.n_changes, r.est_interval_ms, r.next_due_ms))
          }
          assert(last == want, s"split $si: stream diverged from batch\n$last\n$want")
          // prefix consistency for the median-arm url: each emission is
          // the batch answer over that fetch prefix
          val a = rows.filter(_.url == "https://a.com/x").sortBy(_.n_fetches)
            .map(r => (r.n_fetches, r.n_changes, r.est_interval_ms, r.next_due_ms)).toSeq
          assert(a == Seq((1L, 1L, 1000L, 1000L), (2L, 2L, 100L, 200L),
            (3L, 2L, 100L, 280L), (4L, 3L, 100L, 350L)), s"split $si: prefixes $a")
        } finally q.stop()
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("recrawlDueStream 304 + changefreq parity: NULL-hash carry-forward and the prior chain == batch (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      // content, 304, content — the 304 extends the single gap
      FetchObs("https://a.com/x", 0L, "h0"), FetchObs("https://a.com/x", 100L, null),
      FetchObs("https://a.com/x", 200L, "h1"),
      // content once then trailing 304s (static — prior chain)
      FetchObs("https://b.com/y", 0L, "s"), FetchObs("https://b.com/y", 50L, null),
      FetchObs("https://b.com/y", 90L, null),
      // leading 304 then content — only the content fetch is a change;
      // the SAME-timestamp 304 beside the content row pins the
      // null-safe tiebreak (nulls first, the batch window's order)
      FetchObs("https://c.com/z", 10L, null),
      FetchObs("https://c.com/z", 20L, null), FetchObs("https://c.com/z", 20L, "s"))
    val lm = Seq(("https://b.com/y", 40L)).toDF("url", "lastmod_ts")
    // b carries BOTH priors: the changefreq claim (300) must beat the
    // lastmod age (90 - 40 = 50) in each twin — the precedence arm
    val cf = Seq(("https://b.com/y", 300L)).toDF("url", "changefreq_ms")
    val want = graft.pipeline.Recrawl.recrawlDue(
        feed.toDF("url", "fetch_ts", "content_hash"), Some(lm), Some(cf),
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(want == Map(
      "https://a.com/x" -> ((3L, 2L, 200L, 400L)),
      "https://b.com/y" -> ((3L, 1L, 300L, 390L)),
      "https://c.com/z" -> ((3L, 1L, 1000L, 1020L))), s"batch fixture drifted: $want")
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Seq(Seq(9), Seq.fill(9)(1), Seq(4, 3, 2)).zipWithIndex.foreach { case (split, si) =>
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FetchObs]
        val name = s"recrawl_304_out_$si"
        val q = RecrawlStream.recrawlDueStream(in.toDS(), Some(lm), Some(cf),
            defaultIntervalMs = 1000L, minIntervalMs = 50L)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          var rest = feed
          split.foreach { c =>
            val (chunk, tail) = rest.splitAt(c)
            rest = tail
            if (chunk.nonEmpty) { in.addData(chunk); q.processAllAvailable() }
          }
          val rows = spark.table(name).as[RecrawlUpdate].collect()
          assert(rows.length == feed.length, s"split $si: ${rows.length} emissions")
          val last = rows.groupBy(_.url).map { case (u, rs) =>
            val r = rs.maxBy(_.n_fetches)
            u -> ((r.n_fetches, r.n_changes, r.est_interval_ms, r.next_due_ms))
          }
          assert(last == want, s"split $si: stream diverged from batch\n$last\n$want")
        } finally q.stop()
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("recrawlDueStream checkpoint: a fresh query rehydrates exact state from the at-rest fold — restart == uninterrupted (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    // the split point lands MID-HISTORY for every arm: a has learned a
    // median (gaps 100, 80 before the boundary), b is static, c has
    // only its first fetch, d appears only after the boundary
    val half1 = Seq(
      FetchObs("https://a.com/x", 0L, "h0"), FetchObs("https://a.com/x", 100L, "h1"),
      FetchObs("https://a.com/x", 180L, "h2"),
      FetchObs("https://b.com/y", 200L, "s"), FetchObs("https://b.com/y", 300L, "s"),
      FetchObs("https://c.com/z", 10L, "k0"))
    val half2 = Seq(
      FetchObs("https://a.com/x", 250L, "h2"), FetchObs("https://a.com/x", 400L, "h3"),
      FetchObs("https://b.com/y", 500L, "s"),
      FetchObs("https://c.com/z", 40L, "k1"),
      FetchObs("https://d.com/w", 7L, "n0"))
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(name: String, feed: Seq[FetchObs],
              ckpt: Option[org.apache.spark.sql.DataFrame]): Seq[RecrawlUpdate] = {
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FetchObs]
        val q = RecrawlStream.recrawlDueStream(in.toDS(), None,
            defaultIntervalMs = 1000L, minIntervalMs = 10L, maxGaps = 2,
            checkpoint = ckpt)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          in.addData(feed); q.processAllAvailable()
          spark.table(name).as[RecrawlUpdate].collect().toSeq
        } finally q.stop()
      }
      val continuous = run("rck_cont", half1 ++ half2, None)
      val fold = graft.pipeline.Recrawl.recrawlState(
        half1.toDF("url", "fetch_ts", "content_hash"), maxGaps = 2)
      val resumed = run("rck_h2", half2, Some(fold))
      // the resumed run's emissions must equal the continuous run's
      // emissions for the SAME fetches (those past the boundary) —
      // exact state carry-over, not a cold re-init
      val key = (r: RecrawlUpdate) => (r.url, r.n_fetches)
      val contByKey = continuous.map(r => key(r) -> r).toMap
      assert(resumed.nonEmpty && resumed.forall(r => contByKey.get(key(r)).contains(r)),
        s"rehydrated emissions diverged:\nresumed=$resumed\ncontinuous=$continuous")
      assert(resumed.size == half2.size, s"one emission per fetch: ${resumed.size}")
      // and the sliding-window median really crossed the boundary: a's
      // first post-boundary change (gap 220) medians with the RESTORED
      // gaps [100, 80] at maxGaps=2 -> window [80, 220] -> lower 80
      val a = resumed.filter(r => r.url == "https://a.com/x" && r.n_fetches == 5L)
      assert(a.map(_.est_interval_ms).toSeq == Seq(80L),
        s"restored gap window diverged: $a")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("recrawlDueStream bounded gaps: maxGaps slides the median window (the documented divergence)") {
    implicit val sqlCtx = spark.sqlContext
    // change gaps 100, 10, 12: batch medians ALL gaps (12); the stream at
    // maxGaps=2 keeps the last two (10, 12) -> lower median 10
    val feed = Seq(
      FetchObs("u", 0L, "a"), FetchObs("u", 100L, "b"),
      FetchObs("u", 110L, "c"), FetchObs("u", 122L, "d"))
    val batch = graft.pipeline.Recrawl.recrawlDue(
        feed.toDF("url", "fetch_ts", "content_hash"), None,
        defaultIntervalMs = 1000L, minIntervalMs = 1L)
      .collect().map(r => (r.getLong(4), r.getLong(5))).head
    assert(batch == ((12L, 134L)), s"batch fixture drifted: $batch")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FetchObs]
    val q = RecrawlStream.recrawlDueStream(in.toDS(), None,
        defaultIntervalMs = 1000L, minIntervalMs = 1L, maxGaps = 2)
      .writeStream.format("memory").queryName("recrawl_gap_out").outputMode("append").start()
    try {
      in.addData(feed); q.processAllAvailable()
      val last = spark.table("recrawl_gap_out").as[RecrawlUpdate].collect().maxBy(_.n_fetches)
      assert((last.est_interval_ms, last.next_due_ms) == ((10L, 132L)),
        s"sliding-window median diverged: $last")
    } finally q.stop()
  }

  test("recrawlDueStream TTL: long-idle URLs evict and RE-INITIALIZE on next sight (the pinned divergence, RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    // u learns a 10 ms cadence (changes at 0, 10, 20 -> gaps 10, 10);
    // after idling past est + TTL of PROCESSING time its state evicts,
    // so the late refetch restarts cold: first fetch, first change,
    // default estimate — vs ttl=0 where it continues at n_fetches=4
    // with the learned median
    val b1 = Seq(
      FetchObs("u", 0L, "a"), FetchObs("u", 10L, "b"), FetchObs("u", 20L, "c"))
    val b2 = Seq(FetchObs("u", 5000L, "d"))
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      for ((ttl, wantLast) <- Seq(
        (50L, (1L, 1L, 500L, 5500L)),   // re-init: the cold-start default arm
        (0L, (4L, 4L, 10L, 5010L)))) {  // corpus-lifetime: cadence continues
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FetchObs]
        val name = s"recrawl_ttl_$ttl"
        val q = RecrawlStream.recrawlDueStream(in.toDS(), None,
            defaultIntervalMs = 500L, minIntervalMs = 1L, stateTtlMs = ttl)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        // processing-time timeouts run micro-batches continuously —
        // processAllAvailable never quiesces; poll the sink (the
        // politeDispatchStream TTL spec convention)
        def await(n: Int): Unit =
          if (ttl > 0) {
            val deadline = System.currentTimeMillis + 120000L
            while (spark.table(name).count() < n &&
              System.currentTimeMillis < deadline) Thread.sleep(50L)
            assert(spark.table(name).count() >= n, s"sink stuck below $n rows")
          } else q.processAllAvailable()
        try {
          in.addData(b1); await(3)
          if (ttl > 0) Thread.sleep(1000L) // > est (10 ms) + TTL (50 ms)
          in.addData(b2); await(4)
          val rows = spark.table(name).as[RecrawlUpdate].collect()
          val got = rows.maxBy(_.next_due_ms)
          assert((got.n_fetches, got.n_changes, got.est_interval_ms, got.next_due_ms)
            == wantLast, s"ttl=$ttl: got $got")
        } finally q.stop()
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
