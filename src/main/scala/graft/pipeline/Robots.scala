package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt policy resolution — the crawl-compliance stage of the
  * web-ingest provenance family: a corpus built from crawled pages must
  * be able to answer "was this fetch allowed?" per document, both to
  * filter retroactively (a policy added after the crawl) and to audit.
  *
  * Semantics follow the de-facto standard (REP, RFC 9309 / the Google
  * reference parser's documented behavior) restricted to the portable
  * core:
  *
  *  - scope: a policy governs the HOST (origin) that serves it — each
  *    host has its own /robots.txt, an apex policy does NOT govern its
  *    subdomains, and a subdomain's stricter policy must never be
  *    shadowed by the apex's. The rules table is therefore keyed by
  *    host and the decision join matches the document URL's full host
  *    (NOT its registrable domain — that key is for dedup/cap/opt-out,
  *    where subdomains should pool);
  *  - group model: one or more consecutive `User-agent:` lines open a
  *    group; the group's `Allow:`/`Disallow:` rules apply iff one of
  *    its agents is `*` (per-agent token matching is a config knob left
  *    out of scope — corpus pipelines crawl as a generic agent);
  *  - decision: the LONGEST matching prefix wins; on a tie, `Allow`
  *    beats `Disallow`; no rule matches → allowed (and an absent or
  *    empty/NULL robots.txt allows everything); matching is over the
  *    request target — path PLUS optional `?query` (RFC 9309), so a
  *    `Disallow: /search?q=` rule matches;
  *  - an empty `Disallow:` value is "allow all" (no rule), per the
  *    original REP; `$`/`*` wildcards are extensions, out of scope —
  *    prefixes are literal (documented, like the markup extractor's
  *    regex caveat);
  *  - comments (`#` to end of line), blank lines, CRLF, and
  *    case-insensitive field names are handled; unknown fields are
  *    ignored without closing the group (per RFC 9309).
  *
  * Scale shape: parsing is a partition-preserving mapPartitions over
  * the (host, robots_txt) table — one sequential line walk per host,
  * the [[Multimodal]] decode discipline (a line's meaning depends on
  * the lines before it, so scan-side HOFs don't fit). Resolution is one
  * keyed join of the corpus's fixed-width (id, host, path) projection
  * against the rules table (rules-per-host is small; hosts are Zipfian
  * — the join is the same shape as the domain cap's window input) plus
  * one per-document aggregation.
  */
object Robots {

  case class RobotsRule(host: String, prefix: String, allow: Boolean)

  /** Parse one robots.txt body into the `*`-group rules, in file order.
    * A NULL body reads as an EMPTY body (no rules = allow everything —
    * the absent-robots contract; a fetch store records "no robots.txt"
    * as a NULL payload, not as a missing row).
    */
  def parseRobots(host: String, text: String): Seq[RobotsRule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var collectingAgents = false // inside a run of consecutive User-agent lines
    var applies = false          // current group names agent *
    Option(text).getOrElse("").split("\n", -1).foreach { raw =>
      val line = {
        val noCr = if (raw.endsWith("\r")) raw.dropRight(1) else raw
        val hash = noCr.indexOf('#')
        (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!collectingAgents) { collectingAgents = true; applies = false }
            if (value == "*") applies = true
          case "allow" | "disallow" =>
            collectingAgents = false
            // empty Disallow = allow-all (no rule); empty Allow is a
            // no-op the same way
            if (applies && value.nonEmpty)
              out += RobotsRule(host, value, field == "allow")
          case _ => () // unknown fields don't close the agent run (RFC 9309)
        }
      }
    }
    out.toSeq
  }

  /** Parse the `*`-group Crawl-delay of one robots.txt body to integer
    * MILLISECONDS, or None. Crawl-delay is the de-facto politeness
    * extension (not in RFC 9309; Bing/Yandex honor it): decimal seconds
    * are parsed digit-wise (never through a float — "2.5" → 2500 ms
    * exactly), the MINIMUM across `*` groups wins (the conservative
    * politeness choice when a file repeats the field), malformed values
    * are skipped, and groups that never name `*` contribute nothing.
    */
  def parseCrawlDelayMs(text: String): Option[Long] = {
    var best: Option[Long] = None
    var collectingAgents = false
    var applies = false
    Option(text).getOrElse("").split("\n", -1).foreach { raw =>
      val line = {
        val noCr = if (raw.endsWith("\r")) raw.dropRight(1) else raw
        val hash = noCr.indexOf('#')
        (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!collectingAgents) { collectingAgents = true; applies = false }
            if (value == "*") applies = true
          case "allow" | "disallow" => collectingAgents = false
          case "crawl-delay" =>
            collectingAgents = false
            if (applies) {
              val (ip, fp) = value.indexOf('.') match {
                case -1 => (value, "")
                case d  => (value.substring(0, d), value.substring(d + 1))
              }
              val fracOk = fp.forall(_.isDigit)
              if (ip.nonEmpty && ip.forall(_.isDigit) && fracOk && ip.length <= 7) {
                val ms = ip.toLong * 1000L +
                  (fp + "000").take(3).toLong
                best = Some(best.fold(ms)(math.min(_, ms)))
              }
            }
          case _ => ()
        }
      }
    }
    best
  }

  /** Per-host politeness budget from a (host, robots_txt) table: one row
    * per host that declares a `*`-group Crawl-delay — (host, delay_ms,
    * daily_budget = 86_400_000 DIV delay_ms), the fetches-per-day
    * ceiling a polite crawler schedules against. Hosts without the
    * field emit no row (politeness policy is then the crawler's own
    * default, a config knob — absence must stay visible, not default
    * silently here). Partition-preserving mapPartitions, the
    * [[robotsRules]] shape.
    */
  def crawlDelayBudget(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol), col(textCol)).as[(String, String)]
      .mapPartitions(_.flatMap {
        case (null, _) => Iterator.empty
        case (h, t) => parseCrawlDelayMs(t).iterator.map(ms =>
          (h, ms, 86400000L / math.max(ms, 1L)))
      })
      .toDF("host", "delay_ms", "daily_budget")
  }

  /** (host, prefix, allow) rules from a (host, robots_txt) table — the
    * at-rest policy artifact, keyed by the origin host the policy was
    * fetched from. Hosts whose robots.txt yields no `*` rules produce
    * no rows (= allow everything downstream); a NULL body parses as
    * empty; a NULL host is skipped — a rule row without an origin can
    * never match any document, and emitting NULL-keyed rules would just
    * poison the decision join's NULL arm.
    */
  def robotsRules(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol), col(textCol)).as[(String, String)]
      .mapPartitions(_.flatMap {
        case (null, _) => Iterator.empty
        case (h, t)    => parseRobots(h, t)
      })
      .toDF()
  }

  /** TIME-VERSIONED robots decision — the compliance-audit form: "was
    * this fetch allowed under the policy IN FORCE when it happened?"
    * Robots policies change; judging a year-old fetch against today's
    * policy is wrong in both directions (a later Disallow must not
    * retroactively taint lawful fetches, and a later Allow must not
    * launder a violation). `robotsVersions` is the fetch store's policy
    * HISTORY — (host, version_ts, robots_txt), one row per observed
    * policy version, NULL bodies = the absent-robots observation —
    * and each document's decision uses the latest version with
    * version_ts <= its fetch timestamp.
    *
    * A version whose body yields NO `*`-rules (or a NULL body) still
    * REGISTERS as a version: a new permissive policy must supersede an
    * old restrictive one, so versions are carried as (possibly empty)
    * rule arrays, never dropped. Documents with no version at or before
    * their fetch (the crawl predates the first observation) and
    * NULL-host documents are allowed with a NULL `policy_ts` — visible,
    * not silently judged against a future policy.
    *
    * Scale shape: parsing is one mapPartitions over the version store;
    * versions pre-aggregate to ONE array row per (host, version_ts);
    * the in-force election is [[graft.operators.AsOfJoin.backward]]
    * keyed on the host (policy histories per host are short — the
    * timeline window is bounded); the decision is the same scan-side
    * fold as [[robotsAllowed]]. NULL-host docs ride unique synthetic
    * keys (the domainCap discipline — no straggler partition).
    * Output: (idCol, host, allowed, rule_len, policy_ts).
    */
  def robotsAllowedAsOf(
      docs: DataFrame,
      robotsVersions: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      tsCol: String = "fetch_ts",
      hostCol: String = "host",
      versionTsCol: String = "version_ts",
      textCol: String = "robots_txt"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val missing = Seq(hostCol, versionTsCol, textCol)
      .filterNot(robotsVersions.columns.contains)
    require(missing.isEmpty,
      s"robotsAllowedAsOf: robotsVersions must carry ($hostCol, $versionTsCol, " +
        s"$textCol); missing ${missing.mkString(", ")}")
    val reserved = Seq("host", "allowed", "rule_len", "policy_ts", "__k", "__path", "__rules", "__enc")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"robotsAllowedAsOf: docs columns collide with output/internal names " +
        s"(rename them): ${reserved.mkString(", ")}")
    // one row per (host, version) — rule-less versions emit a marker row
    // whose NULL prefix collect_list then skips, leaving an EMPTY array
    val versioned = robotsVersions
      .select(col(hostCol), col(versionTsCol).cast("long"), col(textCol))
      .as[(String, Long, String)]
      .mapPartitions(_.flatMap {
        case (null, _, _) => Iterator.empty
        case (h, ts, t) =>
          val rs = parseRobots(h, t)
          if (rs.isEmpty) Iterator.single((h, ts, null: String, false))
          else rs.iterator.map(r => (h, ts, r.prefix, r.allow))
      })
      .toDF("__k", versionTsCol, "prefix", "allow")
      .groupBy("__k", versionTsCol)
      .agg(collect_list(when(col("prefix").isNotNull,
        struct(col("prefix"), col("allow")))).as("__rules"))
    val docsSide = docs.select(col(idCol),
      UrlOps.hostOf(col(urlCol)).as("host"),
      UrlOps.urlPath(col(urlCol)).as("__path"),
      col(tsCol).cast("long").as(tsCol))
      .withColumn("__k",
        coalesce(col("host"), concat(lit(" "), col(idCol).cast("string"))))
    graft.operators.AsOfJoin.backward(
        docsSide, versioned, keys = Seq("__k"),
        leftTs = tsCol, rightTs = versionTsCol,
        payload = Seq("__rules"), matchedTs = "policy_ts")
      .withColumn("__enc", expr(
        "aggregate(coalesce(__rules, array()), -1L, (acc, r) -> " +
          "greatest(acc, if(startswith(__path, r.prefix), " +
          "length(r.prefix) * 2L + if(r.allow, 1L, 0L), -1L)))"))
      .select(col(idCol), col("host"),
        (col("__enc") === -1L || col("__enc") % 2 === 1L).as("allowed"),
        when(col("__enc") === -1L, lit(-1L)).otherwise(expr("__enc DIV 2")).as("rule_len"),
        col("policy_ts").cast("long").as("policy_ts"))
  }

  /** Per-document robots decision: (idCol, host, allowed, rule_len).
    * `rule_len` is the matched rule's prefix length (ties resolved
    * allow-first), -1 when no rule matched (default allow). NULL-host
    * documents (unparseable provenance) and hosts absent from `rules`
    * are allowed with rule_len -1 — visible, not silently dropped.
    * Matching is host-exact (RFC 9309 origin scope) over the request
    * target ([[UrlOps.urlPath]]: path + optional query).
    *
    * The (len, allow) lexicographic max is encoded as `len * 2 + allow`,
    * computed SCAN-SIDE: rules pre-aggregate to one array row per
    * host (the tiny side pays the only aggregation), each document
    * joins exactly ONE rules row, and the decision is a HOF fold over
    * the array — no per-document fan-out, no second shuffle, and the
    * whole thing is stream-static-join legal, so an ingest stream can
    * drop disallowed fetches online (spec-asserted MemoryStream ==
    * batch).
    */
  def robotsAllowed(
      docs: DataFrame,
      rules: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      keepCols: Seq[String] = Nil): DataFrame = {
    val missing = Seq("host", "prefix", "allow").filterNot(rules.columns.contains)
    require(missing.isEmpty,
      s"robotsAllowed: rules must carry (host, prefix, allow); missing ${missing.mkString(", ")}")
    val reserved = Seq("host", "allowed", "rule_len", "__path", "__rules", "__enc")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"robotsAllowed: docs columns collide with output/internal names " +
        s"(rename them): ${reserved.mkString(", ")}")
    val perHost = rules
      .select(col("host"), col("prefix"), col("allow").cast("boolean").as("allow"))
      .groupBy("host")
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("__rules"))
    docs
      .select((col(idCol) +: keepCols.map(col)) ++ Seq(
        UrlOps.hostOf(col(urlCol)).as("host"),
        UrlOps.urlPath(col(urlCol)).as("__path")): _*)
      .join(perHost, Seq("host"), "left")
      .withColumn("__enc", expr(
        "aggregate(coalesce(__rules, array()), -1L, (acc, r) -> " +
          "greatest(acc, if(startswith(__path, r.prefix), " +
          "length(r.prefix) * 2L + if(r.allow, 1L, 0L), -1L)))"))
      .select((col(idCol) +: keepCols.map(col)) ++ Seq(col("host"),
        (col("__enc") === -1L || col("__enc") % 2 === 1L).as("allowed"),
        when(col("__enc") === -1L, lit(-1L)).otherwise(expr("__enc DIV 2")).as("rule_len")): _*)
  }
}
