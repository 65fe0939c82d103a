package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE sitemap ingest — the streaming twin of
  * [[graft.pipeline.Sitemaps.sitemapPageUrls]], closing the last
  * offline-only channel of the crawl loop (discovery, dispatch, budget,
  * recrawl and the trap guard already run online): sitemap BODIES
  * arrive as they are fetched and page URLs flow to the frontier per
  * micro-batch.
  *
  * The batch form's reachability question (is this body's URL declared,
  * or listed by a declared index?) becomes TRIVIAL online because of a
  * structural property of crawling: a child sitemap is only ever
  * fetched AFTER the index that names it was parsed — the crawler
  * learned the child's URL from that index. So on any feed a real
  * fetcher produces, reachability is decidable AT ARRIVAL:
  *
  *  - a body whose canonical URL is robots-DECLARED (the stream-static
  *    `robots` side, [[graft.pipeline.Robots.sitemapUrls]]) emits its
  *    page locs and registers its index children (ONE hop — the batch
  *    depth bound: children of children are out-of-spec and are never
  *    registered);
  *  - a body whose key was REGISTERED by an earlier index emits page
  *    locs only;
  *  - anything else (undeclared, or a child arriving BEFORE its index —
  *    a feed no real fetcher produces) contributes nothing, the batch
  *    form's undeclared-exclusion contract (spec-pinned divergence on
  *    adversarial orderings).
  *
  * Emissions are PER LISTING — the batch form's (host, url)
  * max-lastmod / min-rank-changefreq / max-priority elections are
  * corpus-level folds; online, re-listings
  * flow through and the frontier's own URL-keyed dedup
  * ([[StreamDedup.discoverFrontierStream]]'s engine-held first-wins, or
  * a downstream recrawl upsert keyed on url) absorbs them. Locs decode/
  * resolve/canonicalize through the SAME column kernels as batch, and
  * the same-host rule applies identically.
  *
  * State: one Set of registered child KEYS per host — bounded by the
  * host's declared index fan-out (model-sized; robots declarations per
  * host are few), not by page count. NoTimeout by the corpus-lifetime
  * contract (an index's children stay valid for the crawl's lifetime).
  */
object SitemapStream {

  case class SitemapFetch(host: String, sitemap_url: String, body: String, arrival: Long)

  case class SitemapPage(
      host: String, url: String, lastmod: String,
      changefreq: String, priority_ppm: Option[Long], arrival: Long)

  /** Per-host state: registered child sitemap keys (public for the
    * encoder — the [[StreamDedup.BudgetDoc]] convention).
    */
  case class ChildSet(keys: Seq[String])

  def sitemapIngestStream(
      fetches: Dataset[SitemapFetch],
      robots: DataFrame): Dataset[SitemapPage] = {
    import fetches.sparkSession.implicits._
    val seeds = broadcast(
      graft.pipeline.Robots.sitemapUrls(robots)
        .select(graft.pipeline.UrlOps.canonicalUrl(col("sitemap_url")).as("__k"),
          lit(true).as("__declared"))
        .distinct())
    // stateless per-row parse + the same decode/resolve/canonicalize
    // column chain as the batch entries table, plus the declared flag
    val entries = fetches.toDF()
      .withColumn("__k", graft.pipeline.UrlOps.canonicalUrl(col("sitemap_url")))
      .join(seeds, Seq("__k"), "left")
      .select(col("host"), col("__k"), col("body"), col("arrival"),
        coalesce(col("__declared"), lit(false)).as("__declared"))
      .as[(String, String, String, Long, Boolean)]
      .map { case (h, k, body, arrival, declared) =>
        val (isIndex, es) = graft.pipeline.Sitemaps.parseSitemap(body)
        (h, k, arrival, declared, isIndex,
          // canonicalize changefreq/priority through the SAME kernels
          // the batch entries table applies at parse time
          es.map(e => (e.loc, e.lastmod.orNull,
            graft.pipeline.Sitemaps.canonicalChangefreq(e.changefreq.orNull).orNull,
            graft.pipeline.Sitemaps.priorityPpm(e.priority.orNull))))
      }
      .toDF("host", "__k", "arrival", "__declared", "__isIndex", "__entries")
      // decode -> resolve(base = the sitemap's own url) -> canonicalize,
      // then the same-host rule — one scan-side HOF over the entry
      // array, the SAME column kernels the batch entries table composes
      .withColumn("__resolved",
        filter(
          transform(col("__entries"), e => struct(
            graft.pipeline.UrlOps.canonicalUrl(
              graft.functions.ResolveHref.of(col("__k"),
                graft.functions.HtmlUnescape.of(e.getField("_1")))).as("u"),
            e.getField("_2").as("lm"),
            e.getField("_3").as("cf"),
            e.getField("_4").as("pp"))),
          x => x.getField("u").isNotNull &&
            graft.pipeline.UrlOps.hostOf(x.getField("u")) === col("host")))
      .select(col("host"), col("__k"), col("arrival"), col("__declared"),
        col("__isIndex"), col("__resolved"))
      .as[(String, String, Long, Boolean, Boolean, Seq[(String, String, String, Option[Long])])]
    entries
      .groupByKey(_._1)
      .flatMapGroupsWithState[ChildSet, SitemapPage](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (host: String,
         it: Iterator[(String, String, Long, Boolean, Boolean, Seq[(String, String, String, Option[Long])])],
         state: GroupState[ChildSet]) =>
          val ordered = it.toSeq.sortBy(r => (r._3, r._2))
          var known = state.getOption.map(_.keys.toSet).getOrElse(Set.empty[String])
          val out = Seq.newBuilder[SitemapPage]
          ordered.foreach { case (h, k, arrival, declared, isIndex, sameHost) =>
            if (declared) {
              if (isIndex) known ++= sameHost.map(_._1) // register children, ONE hop
              else sameHost.foreach { case (u, lm, cf, pp) =>
                out += SitemapPage(h, u, lm, cf, pp, arrival) }
            } else if (known.contains(k)) {
              // a registered child: pages only — a child that is itself
              // an index is the out-of-spec depth-2 chain and registers
              // nothing (the batch bound)
              if (!isIndex)
                sameHost.foreach { case (u, lm, cf, pp) =>
                  out += SitemapPage(h, u, lm, cf, pp, arrival) }
            } // else: undeclared / child-before-index — contributes nothing
          }
          state.update(ChildSet(known.toSeq.sorted))
          out.result().iterator
      }
  }
}
