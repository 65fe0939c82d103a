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
  *
  * `checkpoint` upgrades the re-init to EXACT rehydration: pass
  * [[graft.pipeline.Recrawl.recrawlState]] over the fetch store (built
  * with the SAME `maxGaps`) and a URL whose engine state is absent —
  * evicted by the TTL, or a fresh query start — resumes from the
  * store-held state on first touch, making restart emissions identical
  * to an uninterrupted run (spec-asserted under RocksDB). Engine state
  * always wins over the checkpoint row once present. This is the
  * store-backed bound: TTL keeps hot state small, the at-rest fold
  * keeps eviction lossless.
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
      stateTtlMs: Long = 0L,
      checkpoint: Option[DataFrame] = None): Dataset[RecrawlUpdate] = {
    require(minIntervalMs >= 1 && defaultIntervalMs >= minIntervalMs && maxGaps >= 1,
      s"recrawlDueStream: need minIntervalMs >= 1 <= defaultIntervalMs, maxGaps >= 1")
    require(stateTtlMs >= 0, s"recrawlDueStream: stateTtlMs must be >= 0, got $stateTtlMs")
    checkpoint.foreach { ck =>
      val missing = Seq("url", "last_hash", "last_change_ts", "n_fetches",
        "n_changes", "gaps").filterNot(ck.columns.contains)
      require(missing.isEmpty,
        "recrawlDueStream: checkpoint must carry (url, last_hash, last_change_ts, " +
          s"n_fetches, n_changes, gaps) — a Recrawl.recrawlState table (built with " +
          s"the SAME maxGaps); missing ${missing.mkString(", ")}")
    }
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
    // the at-rest state fold joins stream-static KEYED on url (the
    // store grows with the corpus — per-URL, NOT model-sized, so no
    // broadcast hint: production keeps it bucketed on url at rest)
    val withCkDf = checkpoint match {
      case None => withCfDf
        .withColumn("__ck_h", lit(null).cast("string"))
        .withColumn("__ck_lc", lit(null).cast("long"))
        .withColumn("__ck_nf", lit(null).cast("long"))
        .withColumn("__ck_nc", lit(null).cast("long"))
        .withColumn("__ck_g", lit(null).cast("array<bigint>"))
      case Some(ck) => withCfDf.join(
        // one deterministic state row per url at the boundary (the
        // duplicate-prior discipline): a repeated-url checkpoint must
        // not fan the stream — elect the most-advanced fold
        // (max n_fetches, full-struct tiebreak)
        ck.select(col("url").as("__ck_u"),
            struct(col("n_fetches").cast("long").as("nf"),
              col("n_changes").cast("long").as("nc"),
              col("last_change_ts").cast("long").as("lc"),
              col("last_hash").as("lh"),
              col("gaps").cast("array<bigint>").as("g")).as("__st"))
          .groupBy("__ck_u").agg(max(col("__st")).as("__st"))
          .select(col("__ck_u"), col("__st.lh").as("__ck_h"),
            col("__st.lc").as("__ck_lc"), col("__st.nf").as("__ck_nf"),
            col("__st.nc").as("__ck_nc"), col("__st.g").as("__ck_g")),
        col("url") === col("__ck_u"), "left")
    }
    val withPriors = withCkDf
      .select(col("url"), col("fetch_ts"), col("content_hash"),
        col("__lm_v"), col("__cf_v"),
        col("__ck_h"), col("__ck_lc"), col("__ck_nf"), col("__ck_nc"), col("__ck_g"))
      .as[(String, Long, String, Option[Long], Option[Long],
        Option[String], Option[Long], Option[Long], Option[Long], Option[Seq[Long]])]
      .map { case (u, ts, h, lts, cfs, ckH, ckLc, ckNf, ckNc, ckG) =>
        (FetchObs(u, ts, h), lts, cfs,
          ckNf.map(nf => RecrawlState(ckH.orNull, ckLc.getOrElse(0L), nf,
            ckNc.getOrElse(0L), ckG.getOrElse(Nil))))
      }
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    withPriors
      .groupByKey(_._1.url)
      .flatMapGroupsWithState[RecrawlState, RecrawlUpdate](
        OutputMode.Append(), timeoutConf) {
        (url: String,
         it: Iterator[(FetchObs, Option[Long], Option[Long], Option[RecrawlState])],
         state: GroupState[RecrawlState]) =>
          if (state.hasTimedOut) {
            // long-idle URL: forget the cadence (the pinned re-init
            // divergence — see the scaladoc); with a `checkpoint` the
            // next sight rehydrates EXACTLY from the store instead
            state.remove()
            Iterator.empty
          } else {
          // Option-wrap the hash tiebreak: a 304's NULL hash must sort
          // (nulls first, the batch window's order), not NPE on a tie
          val ordered = it.toSeq.sortBy(r => (r._1.fetch_ts, Option(r._1.content_hash)))
          // engine state wins (any checkpoint it saw is folded in); on
          // first touch after a restart/eviction, rehydrate the exact
          // state from the at-rest fold
          var st = state.getOption
            .orElse(ordered.head._4)
            .getOrElse(RecrawlState(null, 0L, 0L, 0L, Nil))
          val out = ordered.map { case (o, lmTs, cfMs, _) =>
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
