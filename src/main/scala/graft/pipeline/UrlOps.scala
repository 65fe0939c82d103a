package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL and domain operations — the provenance axis of a web corpus
  * pipeline. Crawl pipelines (CCNet, RefinedWeb, FineWeb) run three
  * URL-keyed stages this file provides: CANONICALIZE the URL (the same
  * page arrives under byte-variant URLs — tracking params, fragments,
  * case-variant hosts, default ports — and URL-level dedup is worthless
  * until those collapse), CAP documents per registrable domain (one
  * spammy or over-crawled site must not dominate the corpus — the
  * RefinedWeb/FineWeb anti-spam stage), and report per-domain
  * composition (the data-card table mixture decisions read).
  *
  * Everything is scan-side string/array work (regex component split,
  * HOF param filtering, literal suffix table) except the two keyed
  * operators, which are each ONE aggregation/window keyed by the
  * canonical URL or the domain — the minimal shuffle their semantics
  * require, with fixed-width keys (the text never rides along).
  *
  * Scope, documented: http(s) URLs. Registrable-domain extraction uses
  * a LITERAL two-level-suffix table ([[twoLevelSuffixes]]) — the
  * public-suffix list is a data artifact that changes monthly; the
  * operator takes the last two host labels, or three when the last two
  * form a listed two-level suffix (co.uk, com.au, …). Swap in a fuller
  * table at the same seam for production.
  */
object UrlOps {
  /** Query parameters stripped during canonicalization — tracking
    * decoration that varies per click, never per page.
    */
  val trackingParams: Seq[String] =
    Seq("utm_source", "utm_medium", "utm_campaign", "utm_term",
      "utm_content", "fbclid", "gclid", "msclkid", "ref")

  /** Two-level public suffixes the registrable-domain heuristic knows. */
  val twoLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
      "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
      "co.kr", "co.za")

  // group 2 skips an optional userinfo prefix (user:pass@) — credentials
  // in URLs are transport artifacts and a secrets leak; the canonical
  // form strips them, and the registrable domain must never see them
  private val partsRe = "^(?i)(https?)://(?:[^/?#@]*@)?([^/?#]*)([^?#]*)\\??([^#]*)"

  private def isTracking(p: Column): Column =
    trackingParams.map(t => p === t || p.startsWith(t + "=")).reduce(_ || _)

  /** Canonical form of an http(s) URL Column:
    *  1. fragment dropped (client-side only — never reaches the server),
    *  2. scheme and host lowercased (case-insensitive by RFC 3986),
    *  3. default port stripped (`:80` for http, `:443` for https),
    *  4. trailing path slash trimmed (empty path → `/`),
    *  5. tracking params dropped, the rest SORTED and rejoined (param
    *     order is transport noise; sorting makes equal param sets equal
    *     strings).
    * Non-http(s) input canonicalizes to NULL — an ingest feed carrying
    * ftp/mailto/garbage surfaces as NULL keys, not as silently-kept
    * junk rows.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, partsRe, 1))
    val hostport = lower(regexp_extract(url, partsRe, 2))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(regexp_replace(hostport, ":443$", ""))
    val rawPath = regexp_extract(url, partsRe, 3)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    // an all-slash path reduces to "" after the trim: root it
    val path1 = when(path === "", lit("/")).otherwise(path)
    val rawQuery = regexp_extract(url, partsRe, 4)
    val params = filter(split(rawQuery, "&"), p => p =!= "" && !isTracking(p))
    val query = array_join(array_sort(params), "&")
    val canon = concat(scheme, lit("://"), host, path1,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(scheme === "", lit(null).cast("string")).otherwise(canon)
  }

  /** Registrable domain of a canonical (or raw) URL Column: host minus
    * port, last two labels — or three when the last two are a listed
    * two-level suffix. NULL for non-http(s) input.
    */
  def registrableDomain(url: Column): Column = {
    val host = regexp_replace(lower(regexp_extract(url, partsRe, 2)), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val isTwoLevel = twoLevelSuffixes.map(s => lastTwo === s).reduce(_ || _)
    val dom = when(n <= 2, host)
      .when(isTwoLevel && n >= 3,
        concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .otherwise(lastTwo)
    when(host === "", lit(null).cast("string")).otherwise(dom)
  }

  /** URL-keyed exact dedup: one keeper per canonical URL (min doc id —
    * the [[Dedup.exactDedup]] election keyed on provenance instead of
    * content; run it BEFORE content dedup, it is orders cheaper). Rows
    * whose URL fails to canonicalize keep themselves (NULL is not a
    * dedup key — unparseable provenance must not collapse rows).
    * Output: (idCol, canon_url, keep_id, is_keeper).
    */
  def urlDedup(docs: DataFrame, idCol: String = "doc_id", urlCol: String = "url"): DataFrame = {
    val reserved = Seq("canon_url", "keep_id", "is_keeper").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"urlDedup: docs columns collide with output names (rename them): ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col("canon_url")).orderBy(col(idCol))
    docs
      .withColumn("canon_url", canonicalUrl(col(urlCol)))
      .withColumn("keep_id",
        when(col("canon_url").isNull, col(idCol))
          .otherwise(first(col(idCol)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
      .select(col(idCol), col("canon_url"), col("keep_id"),
        (col(idCol) === col("keep_id")).as("is_keeper"))
  }

  /** Per-domain document cap — the anti-spam stage: at most `cap`
    * documents survive per registrable domain, selected DETERMINISTICALLY
    * by a doc-id-keyed integer hash (the ext_pack_chunks mixing formula —
    * a content-blind uniform draw, so the kept subset is an unbiased
    * sample of the domain, not its first-crawled prefix) with doc id as
    * the total tie-break. NULL-domain rows are all kept with rank 0 —
    * they carry no provenance to cap on (and surface in
    * [[domainStats]]'s NULL row for auditing).
    * Output: (idCol, domain, rank, kept).
    *
    * Scale shape: one window keyed by domain over fixed-width (id, hash)
    * rows. Domains are Zipfian and a hot domain lands in one partition —
    * exactly the rows the cap is about to discard; when only the kept
    * set matters, use [[domainCapSurvivors]], whose rank filter prunes
    * each domain to its cap-smallest rows MAP-SIDE (WindowGroupLimit)
    * before the shuffle — the implemented skew remedy. This disposition
    * form must carry every row's verdict, so it cannot prune.
    */
  def domainCap(
      docs: DataFrame,
      cap: Long,
      idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame = {
    require(cap >= 1, s"domainCap: cap must be positive, got $cap")
    val reserved = Seq("domain", "rank", "kept", "__h").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"domainCap: docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")
    val w = Window.partitionBy("domain")
      .orderBy(col("__h"), col(idCol))
    docs
      .withColumn("domain", registrableDomain(col(urlCol)))
      .withColumn("__h", expr(s"abs($idCol * 2654435761L + 40503L) % 1000000"))
      .withColumn("rank",
        when(col("domain").isNull, lit(0L))
          .otherwise(row_number().over(w).cast("long")))
      .select(col(idCol), col("domain"), col("rank"),
        (col("domain").isNull || col("rank") <= cap).as("kept"))
  }

  /** SURVIVORS-ONLY form of [[domainCap]] — the form to compose into a
    * pipeline that only consumes the kept set: because the `rank <= cap`
    * predicate is a plain filter over a plain `row_number` here (not
    * folded into a disposition flag), Catalyst rewrites it to
    * WindowGroupLimit and prunes each domain to its cap-smallest rows
    * MAP-SIDE, before the shuffle — the hot-domain rows the cap is about
    * to discard never leave their input partitions (plan-asserted). Use
    * [[domainCap]] when the audit columns are the point; use this when
    * the survivors are. Same selection, spec-asserted.
    * Output: (idCol, domain) for every kept row (null-domain rows all
    * pass, as in [[domainCap]]).
    */
  def domainCapSurvivors(
      docs: DataFrame,
      cap: Long,
      idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame = {
    require(cap >= 1, s"domainCapSurvivors: cap must be positive, got $cap")
    val reserved = Seq("domain", "rank", "__h", "__pk").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"domainCapSurvivors: docs columns collide with output/internal names " +
        s"(rename them): ${reserved.mkString(", ")}")
    // ONE window over the whole input (a where/union split would evaluate
    // the upstream pipeline twice — measured 4× on the composed ingest
    // chain): null-domain rows get a UNIQUE per-row partition key (a NUL
    // prefix no real domain can carry), so each sits alone in its window
    // with rank 1 and always passes — the uncapped contract without a
    // second branch, and the rank<=cap filter still rewrites to
    // WindowGroupLimit over every partition
    val withDom = docs
      .withColumn("domain", registrableDomain(col(urlCol)))
      .withColumn("__h", expr(s"abs($idCol * 2654435761L + 40503L) % 1000000"))
      .withColumn("__pk",
        coalesce(col("domain"), concat(lit(" "), col(idCol).cast("string"))))
    val w = Window.partitionBy("__pk").orderBy(col("__h"), col(idCol))
    withDom
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= cap)
      .select(col(idCol), col("domain"))
  }

  /** Per-domain composition report — the data card: document count,
    * character mass, and corpus share in ppm (by characters, the proxy
    * for token mass that needs no tokenizer pass). NULL-domain rows
    * aggregate into their own row so unparseable provenance is VISIBLE,
    * not silently dropped.
    */
  def domainStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(
      registrableDomain(col(urlCol)).as("domain"),
      length(col(textCol)).cast("long").as("__n"))
    val agg = base.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_chars"))
    val tot = agg.agg(sum(col("n_chars")).as("__tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("n_chars"),
        expr("n_chars * 1000000 DIV greatest(__tot, 1)").as("share_ppm"))
  }

  // ---------------------------------------------------------------------
  // DuckDB twins (generated from the SAME constants)
  // ---------------------------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private val partsReD = sqlLit(partsRe)

  private def isTrackingD(p: String): String =
    trackingParams.map(t => s"$p = ${sqlLit(t)} OR starts_with($p, ${sqlLit(t + "=")})")
      .mkString("(", " OR ", ")")

  /** Canonical-URL expression over a column expression `u`. */
  def canonicalUrlD(u: String): String = {
    val scheme = s"lower(regexp_extract($u, $partsReD, 1))"
    val hostport = s"lower(regexp_extract($u, $partsReD, 2))"
    val host = s"CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '') " +
      s"ELSE regexp_replace($hostport, ':443$$', '') END"
    val rawPath = s"regexp_extract($u, $partsReD, 3)"
    val path =
      s"""list_transform([CASE WHEN $rawPath = '' THEN '/'
         |  ELSE regexp_replace($rawPath, '/+$$', '') END],
         |  p0 -> CASE WHEN p0 = '' THEN '/' ELSE p0 END)[1]""".stripMargin.replace("\n", " ")
    val rawQuery = s"regexp_extract($u, $partsReD, 4)"
    // coalesce: DuckDB's array_to_string(list_sort([]), …) is NULL, and a
    // NULL query must read as "no params", not poison the whole concat
    val query =
      s"""coalesce(array_to_string(list_sort(list_filter(string_split($rawQuery, '&'),
         |  p1 -> p1 <> '' AND NOT ${isTrackingD("p1")})), '&'), '')""".stripMargin.replace("\n", " ")
    s"""CASE WHEN $scheme = '' THEN NULL ELSE
       |  $scheme || '://' || ($host) || ($path) ||
       |  list_transform([$query], q0 -> CASE WHEN q0 = '' THEN '' ELSE '?' || q0 END)[1]
       |END""".stripMargin.replace("\n", " ")
  }

  /** Registrable-domain expression over a column expression `u`. */
  def registrableDomainD(u: String): String = {
    val host = s"regexp_replace(lower(regexp_extract($u, $partsReD, 2)), ':[0-9]+$$', '')"
    val suffixes = twoLevelSuffixes.map(sqlLit).mkString("[", ", ", "]")
    s"""list_transform([string_split($host, '.')], ls ->
       |  CASE WHEN array_to_string(ls, '.') = '' THEN NULL
       |       WHEN len(ls) <= 2 THEN array_to_string(ls, '.')
       |       WHEN list_contains($suffixes, ls[-2] || '.' || ls[-1])
       |         THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
       |       ELSE ls[-2] || '.' || ls[-1] END)[1]""".stripMargin.replace("\n", " ")
  }
}
