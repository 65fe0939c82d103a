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
  * The `lastmods` prior (sitemap `<lastmod>`, epoch ms) and the
  * `changefreqs` prior (sitemap `<changefreq>` as interval ms,
  * [[graft.pipeline.Sitemaps.changefreqIntervalMs]]) join
  * stream-static and broadcast — model-sized, the
  * [[StreamDedup.webIngestStream]] aliases discipline; precedence
  * matches batch (observed median, then changefreq, then lastmod age,
  * then default). A NULL content hash is the batch twin's 304 arm — a
  * conditional-fetch "not modified": never a change event, the last
  * observed hash carries forward, the observation still advances
  * n_fetches and next_due. NULL-URL observations are dropped (a fetch
  * record without a URL cannot feed a per-URL queue — visible in the
  * batch form's NULL-host row, not here).
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
      changefreqs: Option[DataFrame] = None,
      defaultIntervalMs: Long = 7L * 86400000L,
      minIntervalMs: Long = 3600000L,
      maxGaps: Int = 16,
      stateTtlMs: Long = 0L): Dataset[RecrawlUpdate] = {
    require(minIntervalMs >= 1 && defaultIntervalMs >= minIntervalMs && maxGaps >= 1,
      s"recrawlDueStream: need minIntervalMs >= 1 <= defaultIntervalMs, maxGaps >= 1")
    require(stateTtlMs >= 0, s"recrawlDueStream: stateTtlMs must be >= 0, got $stateTtlMs")
    import obs.sparkSession.implicits._
    // one deterministic prior per url at the boundary (the alias-map
    // duplicate-src discipline), broadcast stream-static
    def priorMap(df: DataFrame, valueCol: String, kind: String): DataFrame = {
      val missing = Seq("url", valueCol).filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"recrawlDueStream: $kind must carry (url, $valueCol); missing ${missing.mkString(", ")}")
      broadcast(df.where(col(valueCol).isNotNull)
        .groupBy(col("url").as(s"__${kind}_u"))
        .agg(min(col(valueCol).cast("long")).as(s"__${kind}_v")))
    }
    val base = obs.where(col("url").isNotNull).toDF()
    val withLmDf = lastmods match {
      case None => base.withColumn("__lm_v", lit(null).cast("long"))
      case Some(lm) => base.join(priorMap(lm, "lastmod_ts", "lm"),
        col("url") === col("__lm_u"), "left")
    }
    val withCfDf = changefreqs match {
      case None => withLmDf.withColumn("__cf_v", lit(null).cast("long"))
      case Some(cf) => withLmDf.join(priorMap(cf, "changefreq_ms", "cf"),
        col("url") === col("__cf_u"), "left")
    }
    val withPriors = withCfDf
      .select(col("url"), col("fetch_ts"), col("content_hash"),
        col("__lm_v"), col("__cf_v"))
      .as[(String, Long, String, Option[Long], Option[Long])]
      .map { case (u, ts, h, lts, cfs) => (FetchObs(u, ts, h), lts, cfs) }
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    withPriors
      .groupByKey(_._1.url)
      .flatMapGroupsWithState[RecrawlState, RecrawlUpdate](
        OutputMode.Append(), timeoutConf) {
        (url: String, it: Iterator[(FetchObs, Option[Long], Option[Long])],
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
          val out = ordered.map { case (o, lmTs, cfMs) =>
            // the 304 arm: a NULL hash is never a change and the last
            // observed hash carries forward (batch's filled-hash marking)
            val changed = o.content_hash != null &&
              (st.lastHash == null || o.content_hash != st.lastHash)
            val gaps =
              if (changed && st.nChanges > 0L)
                (st.gaps :+ (o.fetch_ts - st.lastChangeTs)).takeRight(maxGaps)
              else st.gaps
            st = RecrawlState(
              if (o.content_hash != null) o.content_hash else st.lastHash,
              if (changed) o.fetch_ts else st.lastChangeTs,
              st.nFetches + 1L,
              st.nChanges + (if (changed) 1L else 0L),
              gaps)
            val est = math.max(
              lowerMedian(gaps)
                .orElse(cfMs)
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
