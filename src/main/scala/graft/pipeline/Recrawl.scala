package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recrawl cadence estimation — the temporal freshness axis of the
  * crawl family: discovery/admission/dispatch decide WHAT may be
  * fetched and WHEN politeness allows it; this decides when a crawled
  * URL is WORTH fetching again, from the evidence a fetch store already
  * holds (per-fetch timestamps and content hashes).
  *
  * Model, per URL:
  *
  *  - a CHANGE EVENT is the first CONTENT-BEARING fetch, or any fetch
  *    whose content hash differs from the last content-bearing fetch's
  *    (hash-equality change detection — byte-identical refetches are
  *    not changes);
  *  - a NULL-hash fetch is a CONDITIONAL-FETCH 304: the server said
  *    "not modified" to an If-None-Match / If-Modified-Since probe, so
  *    there is no body to hash — the row is a NON-CHANGE OBSERVATION
  *    at near-zero fetch cost: it counts in n_fetches, advances
  *    last_fetch (so next_due moves forward), and EXTENDS the current
  *    change gap without minting a change event (the last observed
  *    hash carries forward across it);
  *  - with ≥ 2 observed change events, the estimated change interval
  *    is the LOWER MEDIAN of the gaps between consecutive change
  *    timestamps — the [[graft.timeseries.Infer.estimateStepSeconds]]
  *    tie-arm applied directly (change gaps are irregular, so the mode
  *    arm is noise; the lower median is exact, integer, and
  *    oracle-replayable where a mean would drift);
  *  - with only the initial change event (content never seen to
  *    change), the priors take over, most-specific first: a sitemap
  *    `<changefreq>` claim — mapped to an interval by
  *    [[Sitemaps.changefreqIntervalMs]] — is an EXPLICIT publisher
  *    cadence and wins; then a known external change claim — the
  *    sitemap `<lastmod>` harvested by [[Sitemaps.sitemapPageUrls]],
  *    converted to epoch ms by the caller — gives `last_fetch −
  *    lastmod` (the age-since-last-known-change heuristic; a lastmod
  *    AT OR AFTER our last fetch clamps to the minimum and falls due
  *    immediately, which is exactly right: the publisher claims it
  *    changed since we read it); with no prior the caller's
  *    `defaultIntervalMs` applies;
  *  - every estimate clamps below at `minIntervalMs` (a page observed
  *    changing every fetch must not schedule a busy-loop);
  *  - `next_due_ms = last_fetch_ts + est_interval_ms` — the recrawl
  *    queue row. The frontier unions it: `ext_frontier`'s discovery ∪
  *    sitemap-page set gains `recrawlDue(...).where(next_due_ms <= now)`
  *    as a third source, flowing into the SAME anti-join + politeness
  *    schedule (the queue is per-URL and keyed like every other
  *    frontier source, so the composition is one more unionByName).
  *
  * Output: (url, host, n_fetches, n_changes, est_interval_ms,
  * next_due_ms); host via [[UrlOps.hostOf]] (NULL for unparseable
  * provenance — visible, never dropped).
  *
  * Scale shape: everything keys on the URL — two windows (change
  * marking, gap ranking) and one aggregation over the SAME key, so the
  * chain reuses one partitioning end to end; the lastmod prior is one
  * keyed left join. Fetch histories per URL are short (the politeness
  * budget bounds them), so no skewed window partitions; rows entering
  * the windows are fixed-width (url, ts, hash) projections.
  */
object Recrawl {

  def recrawlDue(
      fetchHistory: DataFrame,
      lastmods: Option[DataFrame] = None,
      changefreqs: Option[DataFrame] = None,
      defaultIntervalMs: Long = 7L * 86400000L,
      minIntervalMs: Long = 3600000L,
      urlCol: String = "url",
      tsCol: String = "fetch_ts",
      hashCol: String = "content_hash"): DataFrame = {
    require(minIntervalMs >= 1, s"recrawlDue: minIntervalMs must be positive, got $minIntervalMs")
    require(defaultIntervalMs >= minIntervalMs,
      s"recrawlDue: defaultIntervalMs ($defaultIntervalMs) must be >= minIntervalMs ($minIntervalMs)")
    lastmods.foreach { lm =>
      val missing = Seq(urlCol, "lastmod_ts").filterNot(lm.columns.contains)
      require(missing.isEmpty,
        s"recrawlDue: lastmods must carry ($urlCol, lastmod_ts); missing ${missing.mkString(", ")}")
    }
    changefreqs.foreach { cf =>
      val missing = Seq(urlCol, "changefreq_ms").filterNot(cf.columns.contains)
      require(missing.isEmpty,
        s"recrawlDue: changefreqs must carry ($urlCol, changefreq_ms); missing ${missing.mkString(", ")}")
    }
    val w = Window.partitionBy(urlCol).orderBy(col(tsCol), col(hashCol))
    val marked = fetchHistory
      .select(col(urlCol), col(tsCol).cast("long").as(tsCol), col(hashCol))
      // the 304 arm: a NULL hash carries the last observed hash forward
      // (same partitioning+ordering as the change window — one exchange)
      .withColumn("__h", last(col(hashCol), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__chg",
        col(hashCol).isNotNull && !(col("__h") <=> lag(col("__h"), 1).over(w)))
    // gaps between consecutive CHANGE timestamps, lower-median elected
    // per url (the Infer.estimateStepSeconds median spelling)
    val gaps = marked.where(col("__chg"))
      .withColumn("__d", col(tsCol) - lag(col(tsCol), 1).over(
        Window.partitionBy(urlCol).orderBy(col(tsCol))))
      .where(col("__d").isNotNull)
    val wUrl = Window.partitionBy(urlCol)
    val med = gaps
      .withColumn("__rn", row_number().over(
        Window.partitionBy(urlCol).orderBy(col("__d"))))
      .withColumn("__cnt", count(lit(1)).over(wUrl))
      .where(col("__rn") === (col("__cnt") + 1).divide(2).cast("long"))
      .select(col(urlCol), col("__d").as("__med"))
    val agg = marked.groupBy(urlCol).agg(
      count(lit(1)).as("n_fetches"),
      sum(when(col("__chg"), 1L).otherwise(0L)).as("n_changes"),
      max(col(tsCol)).as("__lt"))
    val withPrior = lastmods match {
      case None => agg.withColumn("lastmod_ts", lit(null).cast("long"))
      // collapse duplicate url rows to one deterministic prior (min) before
      // the left join — a repeated-url lastmods table must not fan the
      // per-URL queue out (the urlDedupAliased / webIngestStream boundary
      // guard; the streaming twin already groupBy/min's its lastmods)
      case Some(lm) => agg.join(
        lm.select(col(urlCol), col("lastmod_ts").cast("long").as("lastmod_ts"))
          .groupBy(urlCol).agg(min(col("lastmod_ts")).as("lastmod_ts")),
        Seq(urlCol), "left")
    }
    val withCf = changefreqs match {
      case None => withPrior.withColumn("changefreq_ms", lit(null).cast("long"))
      // one deterministic claim per url (min = the most frequent
      // cadence — the sitemapPageUrls election's conservative direction)
      case Some(cf) => withPrior.join(
        cf.select(col(urlCol), col("changefreq_ms").cast("long").as("changefreq_ms"))
          .groupBy(urlCol).agg(min(col("changefreq_ms")).as("changefreq_ms")),
        Seq(urlCol), "left")
    }
    withCf
      .join(med, Seq(urlCol), "left")
      .withColumn("est_interval_ms", greatest(
        when(col("__med").isNotNull, col("__med"))
          .when(col("changefreq_ms").isNotNull, col("changefreq_ms"))
          .when(col("lastmod_ts").isNotNull, col("__lt") - col("lastmod_ts"))
          .otherwise(lit(defaultIntervalMs)),
        lit(minIntervalMs)))
      .select(col(urlCol), UrlOps.hostOf(col(urlCol)).as("host"),
        col("n_fetches"), col("n_changes"), col("est_interval_ms"),
        (col("__lt") + col("est_interval_ms")).as("next_due_ms"))
  }

  /** The recrawl stream's AT-REST STATE FOLD — per URL, the EXACT
    * [[graft.streaming.RecrawlStream.RecrawlState]] the online twin
    * would hold after consuming this fetch store: (url, last_hash —
    * the last content-bearing fetch's hash, NULL if only 304s;
    * last_change_ts — 0 when no change observed, the stream's
    * cold-start value; n_fetches; n_changes; gaps — the LAST `maxGaps`
    * change gaps in chronological order). This is what lets
    * `recrawlDueStream(checkpoint = …)` REHYDRATE an evicted or
    * restarted URL exactly instead of the TTL arm's re-init
    * divergence: the batch store is the state's source of truth (the
    * [[graft.streaming.StreamDedup.templateAdmitCheckpoint]] /
    * dedupAgainstStore pattern), and stream-after-rehydration equals
    * the uninterrupted stream (spec-asserted under RocksDB).
    *
    * Scale shape: the same url-key-only window chain as [[recrawlDue]]
    * plus one url-keyed fold of the ≤ `maxGaps` most recent gaps —
    * every shuffle on the one key, rows fixed-width, the gap arrays
    * bounded by `maxGaps`.
    */
  def recrawlState(
      fetchHistory: DataFrame,
      maxGaps: Int = 16,
      urlCol: String = "url",
      tsCol: String = "fetch_ts",
      hashCol: String = "content_hash"): DataFrame = {
    require(maxGaps >= 1, s"recrawlState: maxGaps must be positive, got $maxGaps")
    val w = Window.partitionBy(urlCol).orderBy(col(tsCol), col(hashCol))
    val marked = fetchHistory
      .select(col(urlCol), col(tsCol).cast("long").as(tsCol), col(hashCol))
      .withColumn("__h", last(col(hashCol), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__chg",
        col(hashCol).isNotNull && !(col("__h") <=> lag(col("__h"), 1).over(w)))
    val agg = marked.groupBy(urlCol).agg(
      max(when(col(hashCol).isNotNull,
        struct(col(tsCol).as("t"), col(hashCol).as("h")))).as("__lh"),
      coalesce(max(when(col("__chg"), col(tsCol))), lit(0L)).as("last_change_ts"),
      count(lit(1)).as("n_fetches"),
      sum(when(col("__chg"), 1L).otherwise(0L)).as("n_changes"))
    val gaps = marked.where(col("__chg"))
      .withColumn("__d", col(tsCol) - lag(col(tsCol), 1).over(
        Window.partitionBy(urlCol).orderBy(col(tsCol))))
      .where(col("__d").isNotNull)
      .withColumn("__rnd", row_number().over(
        Window.partitionBy(urlCol).orderBy(col(tsCol).desc)))
      .where(col("__rnd") <= maxGaps)
      .groupBy(urlCol)
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"), col("__d").as("d"))))
        .as("__g"))
    agg.join(gaps, Seq(urlCol), "left")
      .select(col(urlCol), col("__lh.h").as("last_hash"),
        col("last_change_ts"), col("n_fetches"), col("n_changes"),
        coalesce(transform(col("__g"), x => x.getField("d")),
          array().cast("array<bigint>")).as("gaps"))
  }

  /** CONDITIONAL-FETCH VALIDATORS — the per-URL (ETag, Last-Modified)
    * pair a dispatcher sends back as If-None-Match / If-Modified-Since
    * so the server can answer 304 instead of a full body: [[recrawlDue]]
    * decides WHEN to refetch, this is what lets the refetch cost almost
    * nothing when the page did not change (the 304 rows recrawlDue's
    * hash-absent arm then folds back into the gap evidence).
    *
    * Each validator is elected INDEPENDENTLY as the value of the most
    * recent fetch that CARRIED it (HTTP semantics: a 304 or a response
    * without the header leaves the stored validator in force; a
    * content response that re-states it refreshes it) — a max-struct
    * over (ts, value) per validator, so NULL rows contribute nothing
    * and a trailing run of bare 304s looks back past itself.
    * Equal-timestamp duplicates tie-break on the value itself —
    * deterministic on both engines.
    *
    * Output: (url, etag, last_modified, last_fetch_ts). One
    * aggregation, url-keyed — the SAME key every recrawl shuffle uses,
    * so the dispatch composition `due.join(validators, url, left)` is
    * one more keyed join on an already-partitioned column.
    */
  def fetchValidators(
      fetchHistory: DataFrame,
      urlCol: String = "url",
      tsCol: String = "fetch_ts",
      etagCol: String = "etag",
      lastModifiedCol: String = "last_modified"): DataFrame = {
    val missing = Seq(urlCol, tsCol, etagCol, lastModifiedCol)
      .filterNot(fetchHistory.columns.contains)
    require(missing.isEmpty,
      s"fetchValidators: fetch history must carry ($urlCol, $tsCol, $etagCol, " +
        s"$lastModifiedCol); missing ${missing.mkString(", ")}")
    def latest(c: String) = max(when(col(c).isNotNull,
      struct(col(tsCol).cast("long").as("ts"), col(c).as("v"))))
    fetchHistory
      .groupBy(col(urlCol))
      .agg(latest(etagCol).as("__e"), latest(lastModifiedCol).as("__l"),
        max(col(tsCol).cast("long")).as("last_fetch_ts"))
      .select(col(urlCol), col("__e.v").as("etag"),
        col("__l.v").as("last_modified"), col("last_fetch_ts"))
  }
}
