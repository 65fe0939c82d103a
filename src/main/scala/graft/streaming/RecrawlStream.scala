package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE recrawl-cadence maintenance — the streaming twin of
  * [[graft.pipeline.Recrawl.recrawlDue]]: the batch form estimates
  * change intervals from a fetch store at rest; this maintains the
  * SAME estimate per URL as fetch observations arrive, emitting the
  * updated queue row after every fetch (the downstream scheduler
  * upserts `next_due_ms` into its frontier source).
  *
  * Parity contract with the batch twin (spec-asserted under RocksDB
  * across adversarial micro-batch splits): on an arrival-ordered feed,
  * the LAST emission per URL equals the batch row over the same
  * fetches, and every intermediate emission equals the batch row over
  * that prefix — PROVIDED a URL's observed change count stays within
  * `maxGaps + 1` (the one documented divergence: batch medians over
  * ALL change gaps, the stream over the `maxGaps` most recent — a
  * bounded-state sliding estimate, which is also the right recency
  * weighting for a page whose cadence drifts). Non-monotone feeds
  * follow arrival order (the [[StreamDedup.webIngestStream]]
  * convention); a backfill re-runs the batch form.
  *
  * The `lastmods` prior (sitemap `<lastmod>`, epoch ms) joins
  * stream-static and broadcast — model-sized, the
  * [[StreamDedup.webIngestStream]] aliases discipline. NULL-URL
  * observations are dropped (a fetch record without a URL cannot feed
  * a per-URL queue — visible in the batch form's NULL-host row, not
  * here).
  *
  * State: (last hash, last change ts, two counters, ≤ `maxGaps` longs)
  * per URL — fixed-width per key, but the KEY dimension grows with the
  * corpus (every URL ever fetched), so production BOUNDS it with
  * `stateTtlMs > 0`: a URL idle for its OWN estimated interval plus the
  * TTL (processing time — the [[StreamDedup.politeDispatchStream]]
  * reaper discipline, same arrival≈processing-time precondition) is
  * evicted. Unlike the dispatcher, eviction here is NOT
  * decision-identical — the gap history is the one state the batch
  * store can't reconstruct from absence — so the divergence is PINNED
  * as a principled degradation: the next observation of an evicted URL
  * RE-INITIALIZES (counts as a first fetch and a change; the estimate
  * restarts at the lastmod prior or the default, exactly the cold-start
  * arm), and the cadence re-learns over the next `maxGaps` changes. A
  * URL idle that long has an estimate that stale anyway — restarting at
  * the prior is the honest restart, and the batch twin over the full
  * store remains the backfill truth. `stateTtlMs = 0` keeps the
  * NoTimeout corpus-lifetime form (specs, bounded corpora).
  */
object RecrawlStream {

  case class FetchObs(url: String, fetch_ts: Long, content_hash: String)

  case class RecrawlUpdate(
      url: String, n_fetches: Long, n_changes: Long,
      est_interval_ms: Long, next_due_ms: Long)

  case class RecrawlState(
      lastHash: String, lastChangeTs: Long,
      nFetches: Long, nChanges: Long, gaps: Seq[Long])

  /** Lower median of the gap multiset — element at zero-based index
    * (n−1)/2 of the ascending sort, the
    * [[graft.pipeline.Recrawl.recrawlDue]] spelling.
    */
  private def lowerMedian(gaps: Seq[Long]): Option[Long] =
    if (gaps.isEmpty) None
    else Some(gaps.sorted.apply((gaps.size - 1) / 2))

  def recrawlDueStream(
      obs: Dataset[FetchObs],
      lastmods: Option[DataFrame] = None,
      defaultIntervalMs: Long = 7L * 86400000L,
      minIntervalMs: Long = 3600000L,
      maxGaps: Int = 16,
      stateTtlMs: Long = 0L): Dataset[RecrawlUpdate] = {
    require(minIntervalMs >= 1 && defaultIntervalMs >= minIntervalMs && maxGaps >= 1,
      s"recrawlDueStream: need minIntervalMs >= 1 <= defaultIntervalMs, maxGaps >= 1")
    require(stateTtlMs >= 0, s"recrawlDueStream: stateTtlMs must be >= 0, got $stateTtlMs")
    import obs.sparkSession.implicits._
    val withLm: Dataset[(FetchObs, Option[Long])] = lastmods match {
      case None => obs.where(col("url").isNotNull)
        .map(o => (o, Option.empty[Long]))
      case Some(lm) =>
        val missing = Seq("url", "lastmod_ts").filterNot(lm.columns.contains)
        require(missing.isEmpty,
          s"recrawlDueStream: lastmods must carry (url, lastmod_ts); missing ${missing.mkString(", ")}")
        // one deterministic prior per url at the boundary (the alias-map
        // duplicate-src discipline)
        val m = broadcast(lm.where(col("lastmod_ts").isNotNull)
          .groupBy(col("url").as("__lu"))
          .agg(min(col("lastmod_ts").cast("long")).as("__lts")))
        obs.where(col("url").isNotNull).toDF()
          .join(m, col("url") === col("__lu"), "left")
          .select(col("url"), col("fetch_ts"), col("content_hash"), col("__lts"))
          .as[(String, Long, String, Option[Long])]
          .map { case (u, ts, h, lts) => (FetchObs(u, ts, h), lts) }
    }
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    withLm
      .groupByKey(_._1.url)
      .flatMapGroupsWithState[RecrawlState, RecrawlUpdate](
        OutputMode.Append(), timeoutConf) {
        (url: String, it: Iterator[(FetchObs, Option[Long])],
         state: GroupState[RecrawlState]) =>
          if (state.hasTimedOut) {
            // long-idle URL: forget the cadence (the pinned re-init
            // divergence — see the scaladoc); the batch twin rebuilds
            // the exact estimate from the store on the next backfill
            state.remove()
            Iterator.empty
          } else {
          val ordered = it.toSeq.sortBy(r => (r._1.fetch_ts, r._1.content_hash))
          var st = state.getOption.getOrElse(RecrawlState(null, 0L, 0L, 0L, Nil))
          val out = ordered.map { case (o, lmTs) =>
            val changed = st.nFetches == 0L || o.content_hash != st.lastHash
            val gaps =
              if (changed && st.nChanges > 0L)
                (st.gaps :+ (o.fetch_ts - st.lastChangeTs)).takeRight(maxGaps)
              else st.gaps
            st = RecrawlState(
              o.content_hash,
              if (changed) o.fetch_ts else st.lastChangeTs,
              st.nFetches + 1L,
              st.nChanges + (if (changed) 1L else 0L),
              gaps)
            val est = math.max(
              lowerMedian(gaps)
                .orElse(lmTs.map(l => o.fetch_ts - l))
                .getOrElse(defaultIntervalMs),
              minIntervalMs)
            RecrawlUpdate(url, st.nFetches, st.nChanges, est, o.fetch_ts + est)
          }
          state.update(st)
          if (stateTtlMs > 0) {
            // idle past the URL's own estimated cadence plus the TTL →
            // the estimate is stale; evict and re-learn on next sight
            state.setTimeoutDuration(out.last.est_interval_ms + stateTtlMs)
          }
          out.iterator
          }
      }
  }
}
