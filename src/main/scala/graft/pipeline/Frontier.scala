package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VALUE-ORDERED frontier prioritization — the composition that turns
  * "what MAY be fetched" (discovery ∪ sitemap ∪ recrawl, anti-joined,
  * robots-filtered) into "what is fetched FIRST". A real crawler's
  * per-host queue is ordered by expected value, not URL spelling; the
  * inputs all exist in this pipeline already and this operator only
  * composes them into one integer score:
  *
  *   priority = rank prior                       (domain centrality,
  *              [[LinkGraph.pageRankPpm]] / harmonic — the
  *              [[UrlOps.domainCapByRank]] table shape, ppm)
  *            + reason rank · reasonWeightPpm    (recrawl=2, sitemap=1,
  *              discovered=0 — a known-changed page beats a
  *              publisher-listed page beats a raw discovery)
  *            + overdue age, saturating          (min(1e6, age_ms·1e6
  *              DIV ageScaleMs) — the longer past due, the staler)
  *            + sitemap priority                 (the publisher's own
  *              `<priority>` claim in ppm, elected max per URL by
  *              [[Sitemaps.sitemapPageUrls]] — absent → 0)
  *            − trap share                       ([[UrlOps.crawlTraps]]
  *              share_ppm of the URL's (host, template) — candidates
  *              inside a suspected trap pool pay their pool's share)
  *
  * Everything is exact BIGINT ppm arithmetic (the int8/PQ discipline):
  * the score is closed-form, engine-exact, and the DuckDB twin replays
  * it term by term. Unknown reason strings score NULL — visible in the
  * output, never silently pooled (the NULL-host convention).
  *
  * Scale shape: three keyed joins, each against a table that is either
  * model-sized (ranks — domain-level, broadcastable at ~1e8 rows ÷
  * AQE's call) or derived from the candidates themselves (trap shares —
  * rows = distinct templates; due ages — the recrawl queue), plus
  * scan-side host/domain/template derivation. No window here; the
  * ordering happens once, in [[fetchScheduleByPriority]]'s per-host
  * window, where the budget filter prunes map-side (WindowGroupLimit).
  */
object Frontier {

  /** Attach `host` and the closed-form `priority` to frontier
    * candidates. `cands` carries (urlCol, reason); `ranks` is any
    * (domain, rank_ppm) quality table; `dueAges` maps recrawl URLs to
    * their overdue age in ms (absent url → 0); `trapShares` is
    * [[UrlOps.crawlTraps]] output (absent template → 0);
    * `sitemapPriorities` maps URLs to the publisher's `<priority>`
    * claim in ppm ([[Sitemaps.sitemapPageUrls]]'s priority_ppm column;
    * absent url → 0).
    */
  def frontierPriority(
      cands: DataFrame,
      ranks: DataFrame,
      dueAges: Option[DataFrame] = None,
      trapShares: Option[DataFrame] = None,
      sitemapPriorities: Option[DataFrame] = None,
      defaultRankPpm: Long = 150000L,
      ageScaleMs: Long = 7L * 86400000L,
      reasonWeightPpm: Long = 500000L,
      urlCol: String = "url",
      ageCol: Option[String] = None,
      sitemapPrioritiesUnique: Boolean = false,
      trapSharesFromCands: Boolean = false): DataFrame = {
    require(ageScaleMs >= 1, s"frontierPriority: ageScaleMs must be positive, got $ageScaleMs")
    val missing = Seq("domain", "rank_ppm").filterNot(ranks.columns.contains)
    require(missing.isEmpty,
      s"frontierPriority: ranks must carry (domain, rank_ppm); missing ${missing.mkString(", ")}")
    val reserved = Seq("host", "priority", "__dom", "__tpl", "__rkp", "__age", "__shr",
        "__smp", "__nht", "__nh", "__ckn")
      .filter(cands.columns.contains)
    require(reserved.isEmpty,
      s"frontierPriority: cands columns collide with output/internal names " +
        s"(rename them): ${reserved.mkString(", ")}")
    require(cands.columns.contains("reason"),
      "frontierPriority: cands must carry reason (recrawl/sitemap/discovered)")
    // Opt-in contract guard (spark.graft.checkContracts=true): the
    // ageCol / trapSharesFromCands / sitemapPrioritiesUnique fast paths
    // are value-identical ONLY under a one-row-per-url contract that is
    // documented at the call sites and oracle-gated but otherwise
    // unchecked — under the conf a duplicate url RAISES (assert_true)
    // instead of silently inflating ages/shares/claims. Off by default
    // and plan-invisible when off: no expression is added. Debug cost
    // when on: one windowed count per guarded frame.
    val checkContracts = cands.sparkSession.conf
      .get("spark.graft.checkContracts", "false").toBoolean
    def uniqueGuard(df: DataFrame, what: String): DataFrame =
      if (!checkContracts) df
      else df
        .withColumn("__ckn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(urlCol))))
        .where(expr(s"assert_true(__ckn = 1, 'frontierPriority: $what requires " +
          s"one row per $urlCol and the input has duplicates " +
          s"(spark.graft.checkContracts)') is null"))
        .drop("__ckn")
    val guardedCands =
      if (ageCol.nonEmpty || trapSharesFromCands)
        uniqueGuard(cands, "the ageCol/trapSharesFromCands fast path")
      else cands
    val withKeys = guardedCands
      .withColumn("host", UrlOps.hostOf(col(urlCol)))
      .withColumn("__dom", UrlOps.registrableDomain(col(urlCol)))
      .withColumn("__tpl", UrlOps.urlTemplate(col(urlCol)))
    val withRank = withKeys.join(
      ranks.select(col("domain").as("__dom"), col("rank_ppm").cast("long").as("__rkp")),
      Seq("__dom"), "left")
    require(ageCol.isEmpty || dueAges.isEmpty,
      "frontierPriority: pass EITHER ageCol (an age column already on cands) " +
        "OR dueAges (a url-keyed age table), not both")
    val withAge = (ageCol, dueAges) match {
      // scan-side fast path: the caller's cands ALREADY carry their own
      // overdue age (the frontier composition derives cands and ages
      // from one recrawl queue, one row per url) — reading the column
      // in place removes the groupBy+self-join exchange pair the table
      // form pays (guide §2.4). Equivalent to dueAges =
      // Some(cands.select(url, age)) whenever cands is unique per url,
      // which the frontier channels guarantee by construction.
      case (Some(c), _) =>
        require(cands.columns.contains(c),
          s"frontierPriority: ageCol=$c is not a cands column " +
            s"(${cands.columns.mkString(", ")})")
        withRank.withColumn("__age", col(c).cast("long"))
      case (None, None) => withRank.withColumn("__age", lit(0L))
      case (None, Some(da)) =>
        val m = Seq(urlCol, "age_ms").filterNot(da.columns.contains)
        require(m.isEmpty,
          s"frontierPriority: dueAges must carry ($urlCol, age_ms); missing ${m.mkString(", ")}")
        // one deterministic age per url at the boundary (the recrawlDue
        // duplicate-prior discipline) — the LARGEST overdue age wins
        withRank.join(
          da.groupBy(urlCol).agg(max(col("age_ms").cast("long")).as("__age")),
          Seq(urlCol), "left")
    }
    require(!trapSharesFromCands || trapShares.isEmpty,
      "frontierPriority: pass EITHER trapSharesFromCands (derive shares from cands " +
        "in place) OR trapShares (a crawlTraps table), not both")
    val withShare = (trapSharesFromCands, trapShares) match {
      case (true, _) =>
        // in-place fast path: when the shares WOULD be crawlTraps(cands)
        // itself (the frontier composition) and cands is unique per url,
        // the (host, template) pool count and the host total are two
        // window counts over the candidate frame — one host-keyed
        // exchange serves both (the template window's clustering is a
        // superset of the host partitioning), and the separate
        // groupBy + host-window + join-back derivation disappears
        // (guide §2.4). NULL-host rows score 0 exactly as the table
        // form's unmatched left-join arm did.
        val wH = org.apache.spark.sql.expressions.Window.partitionBy("host")
        val wHT = org.apache.spark.sql.expressions.Window.partitionBy("host", "__tpl")
        withAge
          .withColumn("__nht", count(lit(1)).over(wHT))
          .withColumn("__nh", count(lit(1)).over(wH))
          // integer DIV — bit-identical to crawlTraps's share_ppm
          .withColumn("__shr",
            when(col("host").isNotNull,
              expr("__nht * 1000000L DIV greatest(__nh, 1L)")).otherwise(lit(0L)))
          .drop("__nht", "__nh")
      case (false, None) => withAge.withColumn("__shr", lit(0L))
      case (false, Some(ts)) =>
        val m = Seq("host", "template", "share_ppm").filterNot(ts.columns.contains)
        require(m.isEmpty,
          s"frontierPriority: trapShares must carry (host, template, share_ppm); " +
            s"missing ${m.mkString(", ")}")
        withAge.join(
          ts.select(col("host"), col("template").as("__tpl"),
            col("share_ppm").cast("long").as("__shr")),
          Seq("host", "__tpl"), "left")
    }
    val withSmp = sitemapPriorities match {
      case None => withShare.withColumn("__smp", lit(0L))
      case Some(sp) =>
        val m = Seq(urlCol, "priority_ppm").filterNot(sp.columns.contains)
        require(m.isEmpty,
          s"frontierPriority: sitemapPriorities must carry ($urlCol, priority_ppm); " +
            s"missing ${m.mkString(", ")}")
        // one deterministic claim per url (max — the sitemapPageUrls
        // election direction) at the boundary;
        // sitemapPrioritiesUnique = the caller's DOCUMENTED contract
        // that the table is already one row per url (true for
        // [[Sitemaps.sitemapPageUrls]] output, which elects max per url
        // at harvest) — max over a single row is that row, so skipping
        // the fold drops its exchange without changing any value
        val folded =
          if (sitemapPrioritiesUnique)
            uniqueGuard(sp, "sitemapPrioritiesUnique")
              .select(col(urlCol), col("priority_ppm").cast("long").as("__smp"))
          else sp.groupBy(urlCol).agg(max(col("priority_ppm").cast("long")).as("__smp"))
        withShare.join(folded, Seq(urlCol), "left")
    }
    val reasonRank = when(col("reason") === "recrawl", 2L)
      .when(col("reason") === "sitemap", 1L)
      .when(col("reason") === "discovered", 0L) // else NULL — visible
    withSmp
      .withColumn("priority",
        coalesce(col("__rkp"), lit(defaultRankPpm))
          + reasonRank * lit(reasonWeightPpm)
          + least(lit(1000000L),
              expr(s"coalesce(__age, 0L) * 1000000L DIV ${ageScaleMs}L"))
          + coalesce(col("__smp"), lit(0L))
          - coalesce(col("__shr"), lit(0L)))
      .drop("__dom", "__tpl", "__rkp", "__age", "__shr", "__smp")
  }

  /** Per-host BUDGETED top-k dispatch by priority — ONE window with
    * [[Robots.fetchSchedule]] (this is that operator, parameterized:
    * ordered by `(priority DESC, url)` instead of URL spelling and
    * capped at `maxPerHost` — the `slot <= k` filter over the plain
    * row_number rewrites to WindowGroupLimit, so a 10⁶-candidate host
    * prunes to k map-side before the shuffle, the
    * [[UrlOps.templateCapSurvivors]] discipline). NULLS LAST is
    * explicit on both engines: an unknown-reason NULL priority must
    * sort below every scored candidate, identically. Slots keep the
    * politeness spacing contract: slot k may not fire before
    * `(k−1) · delay`.
    *
    * Output: (host, url, priority, slot, not_before_ms).
    */
  def fetchScheduleByPriority(
      candidates: DataFrame,
      budgets: DataFrame,
      maxPerHost: Long,
      defaultDelayMs: Long = 1000L,
      hostCol: String = "host",
      urlCol: String = "url"): DataFrame = {
    require(candidates.columns.contains("priority"),
      "fetchScheduleByPriority: candidates must carry priority (frontierPriority output)")
    Robots.fetchSchedule(candidates, budgets, defaultDelayMs, hostCol, urlCol,
      orderBy = Seq(col("priority").desc_nulls_last, col(urlCol)),
      keepCols = Seq("priority"),
      maxPerHost = Some(maxPerHost),
      opName = "fetchScheduleByPriority")
  }
}
