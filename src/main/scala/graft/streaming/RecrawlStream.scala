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
  * per URL — fixed-width, NoTimeout by the corpus-lifetime contract of
  * the URL-dedup family (this state IS the crawl's memory of the page;
  * evicting it forgets the cadence, unlike the politeness dispatcher
  * whose expired slot is reconstructible as absent).
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
      maxGaps: Int = 16): Dataset[RecrawlUpdate] = {
    require(minIntervalMs >= 1 && defaultIntervalMs >= minIntervalMs && maxGaps >= 1,
      s"recrawlDueStream: need minIntervalMs >= 1 <= defaultIntervalMs, maxGaps >= 1")
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
    withLm
      .groupByKey(_._1.url)
      .flatMapGroupsWithState[RecrawlState, RecrawlUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (url: String, it: Iterator[(FetchObs, Option[Long])],
         state: GroupState[RecrawlState]) =>
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
          out.iterator
      }
  }
}
