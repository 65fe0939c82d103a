package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._
  import Robots._

  private def rules(text: String): Seq[(String, Boolean)] =
    parseRobots("d", text).map(r => (r.prefix, r.allow))

  test("parseRobots: group model — only *-groups apply, agent runs share rules") {
    // a named-agent group first, then a * group
    assert(rules("User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /a\n")
      == Seq(("/a", false)))
    // consecutive User-agent lines form ONE group: * anywhere in the run applies
    assert(rules("User-agent: googlebot\nUser-agent: *\nDisallow: /b\n")
      == Seq(("/b", false)))
    // after a rule, a new User-agent line OPENS A NEW group — the old *
    // does not leak into it
    assert(rules("User-agent: *\nDisallow: /a\nUser-agent: badbot\nDisallow: /b\n")
      == Seq(("/a", false)))
    // no * group at all → no rules
    assert(rules("User-agent: badbot\nDisallow: /\n").isEmpty)
  }

  test("parseRobots: comments, CRLF, case-insensitive fields, unknown fields, empty values") {
    assert(rules("# hello\r\nUSER-AGENT: *\r\nDISALLOW: /x # trailing\r\nallow: /x/y\r\n")
      == Seq(("/x", false), ("/x/y", true)))
    // an unknown field inside a group does NOT close the agent run
    // (RFC 9309) — rules after it still apply
    assert(rules("User-agent: *\nHost: example.com\nDisallow: /z\n")
      == Seq(("/z", false)))
    // crawl-delay is GROUP-SCOPED like allow/disallow: it does not end
    // the group (later rules still apply) ...
    assert(rules("User-agent: *\nCrawl-delay: 5\nDisallow: /z\n")
      == Seq(("/z", false)))
    // ... but it DOES end the agent run — a later User-agent line opens
    // a NEW group, consistently with parseCrawlDelayMs (the two parsers
    // share one group walker, so rules and delays cannot disagree about
    // group boundaries)
    assert(rules("User-agent: *\nCrawl-delay: 5\nUser-agent: bot\nDisallow: /x\n").isEmpty)
    assert(parseCrawlDelayMs(
      "User-agent: *\nCrawl-delay: 5\nUser-agent: bot\nCrawl-delay: 9\n") == Some(5000L))
    // sitemap is NOT group-scoped: it neither ends the run nor joins
    // the group — rules around it are unaffected
    assert(rules("User-agent: *\nSitemap: https://a.com/s.xml\nDisallow: /z\n")
      == Seq(("/z", false)))
    // empty Disallow = allow-all (no rule); empty Allow is a no-op
    assert(rules("User-agent: *\nDisallow:\nAllow:\n").isEmpty)
    // garbage lines without a colon are ignored
    assert(rules("User-agent: *\nnot a directive\nDisallow: /q\n")
      == Seq(("/q", false)))
  }

  test("parseRobots: RFC 9309 named-agent precedence — most specific wins, * is the fallback") {
    val body =
      "User-agent: my\nDisallow: /short\n\n" +
        "User-agent: MyBot\nDisallow: /p/\nAllow: /private\n\n" +
        "User-agent: *\nDisallow: /star\n"
    // agent token prefix-matches case-insensitively; the LONGEST
    // matching token's group wins — `mybot-news` matches `my` (2) and
    // `mybot` (5); only the `mybot` group applies
    assert(parseRobots("d", body, "mybot-news").map(r => (r.prefix, r.allow))
      == Seq(("/p/", false), ("/private", true)))
    // a shorter-only match takes its own group
    assert(parseRobots("d", body, "myfetcher").map(r => (r.prefix, r.allow))
      == Seq(("/short", false)))
    // no named match → the * group
    assert(parseRobots("d", body, "otherbot").map(r => (r.prefix, r.allow))
      == Seq(("/star", false)))
    // two groups tying at the winning token COMBINE in file order
    val dup = "User-agent: mybot\nDisallow: /a\n\nUser-agent: MYBOT\nDisallow: /b\n"
    assert(parseRobots("d", dup, "mybot").map(_.prefix) == Seq("/a", "/b"))
    // the * form never takes named groups
    assert(parseRobots("d", "User-agent: mybot\nDisallow: /a\n").isEmpty)
    // delay selects with the same precedence
    val dbody = "User-agent: mybot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(parseCrawlDelayMs(dbody, "mybot") == Some(2000L))
    assert(parseCrawlDelayMs(dbody) == Some(7000L))
    assert(parseCrawlDelayMs(dbody, "unnamed") == Some(7000L))
  }

  test("sitemapUrls: host-wide harvest, file order, NULL hosts skipped") {
    assert(parseSitemaps(
      "Sitemap: https://a.com/s1.xml\nUser-agent: *\nSitemap: https://a.com/s2.xml\nDisallow: /x\n")
      == Seq("https://a.com/s1.xml", "https://a.com/s2.xml"))
    assert(parseSitemaps(null).isEmpty)
    val got = sitemapUrls(Seq(
        ("a.com", "Sitemap: https://a.com/one.xml\nSitemap: https://a.com/two.xml\n"),
        ("b.com", "User-agent: *\nDisallow: /\n"),
        (null.asInstanceOf[String], "Sitemap: https://x.com/s.xml\n"))
      .toDF("host", "robots_txt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got == Seq(("a.com", "https://a.com/one.xml", 1L),
      ("a.com", "https://a.com/two.xml", 2L)))
  }

  test("crawlBudgetKept: per-(host, day) arrival-order budget; undeclared and NULL hosts pass") {
    val docs = Seq(
      (1L, "https://a.com/1", 10L),             // day 0, rank 1 — kept
      (2L, "https://a.com/2", 20L),             // day 0, rank 2 — kept
      (3L, "https://a.com/3", 30L),             // day 0, rank 3 — over budget
      (4L, "https://a.com/4", 86400000L + 5L),  // day 1 resets the window
      (5L, "https://b.com/1", 10L),             // no declared budget: uncapped
      (6L, "not a url", 10L)                    // NULL host: uncapped
    ).toDF("doc_id", "url", "fetch_ts")
    val budgets = Seq(("a.com", 2L)).toDF("host", "daily_budget")
    val got = crawlBudgetKept(docs, budgets)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> ((0L, 1L, true)), 2L -> ((0L, 2L, true)), 3L -> ((0L, 3L, false)),
      4L -> ((1L, 1L, true)), 5L -> ((0L, 0L, true)), 6L -> ((0L, 0L, true))), got.toString)
    val e = intercept[IllegalArgumentException](
      crawlBudgetKept(docs, Seq(Tuple1("x")).toDF("host")))
    assert(e.getMessage.contains("daily_budget"))
  }

  test("robotsAllowed: longest prefix wins, allow beats disallow on ties, default allow") {
    val docs = Seq(
      (1L, "https://a.com/private/pub/x"),  // allow (len-12 Allow beats len-8 Disallow)
      (2L, "https://a.com/private/x"),      // deny (len 8)
      (3L, "https://a.com/open"),           // no match → allow, -1
      (4L, "https://a.com/tie"),            // equal-length allow+disallow → allow
      (5L, "https://b.com/anything"),       // no rules for b.com → allow
      (6L, "not a url")                     // null domain → allow, visible
    ).toDF("doc_id", "url")
    val r = Seq(
      ("a.com", "/private", false), ("a.com", "/private/pub", true),
      ("a.com", "/tie", false), ("a.com", "/tie", true)
    ).toDF("host", "prefix", "allow")
    val full = robotsAllowed(docs, r)
      .collect().map(x => (x.getLong(0), (x.getBoolean(2), x.getLong(3)))).toMap
    assert(full(1L) == ((true, 12L)))
    assert(full(2L) == ((false, 8L)))
    assert(full(3L) == ((true, -1L)))
    assert(full(4L) == ((true, 4L)))
    assert(full(5L) == ((true, -1L)))
    assert(full(6L) == ((true, -1L)))
    assert(full.size == 6)
  }

  test("robotsAllowed is stream-static legal: an ingest stream drops disallowed fetches online") {
    implicit val sqlCtx = spark.sqlContext
    val r = Seq(("a.com", "/private", false), ("a.com", "/private/pub", true))
      .toDF("host", "prefix", "allow")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = robotsAllowed(in.toDF().toDF("doc_id", "url"), r)
      .writeStream.format("memory").queryName("robots_stream").outputMode("append").start()
    try {
      in.addData((1L, "https://a.com/private/x"), (2L, "https://a.com/private/pub/y"),
        (3L, "https://b.com/z"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("robots_stream").collect()
      .map(x => (x.getLong(0), x.getBoolean(2))).toMap
    val batch = robotsAllowed(Seq((1L, "https://a.com/private/x"),
        (2L, "https://a.com/private/pub/y"), (3L, "https://b.com/z")).toDF("doc_id", "url"), r)
      .collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(got == batch && got == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("robotsRules + robotsAllowed end-to-end: parsed text drives the decision") {
    val robots = Seq(("www.shop.com",
      "User-Agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /cart\nAllow: /cart/help\n"))
      .toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://www.shop.com/cart/checkout"),
      (2L, "https://www.shop.com/cart/help/faq"),
      (3L, "https://www.shop.com/")).toDF("doc_id", "url")
    val got = robotsAllowed(docs, robotsRules(robots))
      .collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true))
    val e = intercept[IllegalArgumentException](
      robotsAllowed(docs, Seq(Tuple1("x")).toDF("host")))
    assert(e.getMessage.contains("prefix"))
  }

  test("robots scope is the HOST, not the registrable domain (RFC 9309 origin scope)") {
    // a stricter subdomain policy must bind on that subdomain, and the
    // apex's policy must NOT be over-applied to subdomains
    val robots = Seq(
      ("private.example.com", "User-agent: *\nDisallow: /\n"),
      ("example.com", "User-agent: *\nDisallow: /admin\n")).toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://private.example.com/anything"), // subdomain's own Disallow: /
      (2L, "https://example.com/admin/x"),          // apex rule binds on apex
      (3L, "https://www.example.com/admin/x"),      // www has no policy -> allowed
      (4L, "https://EXAMPLE.com:443/admin/x")       // host lowercased, port stripped
    ).toDF("doc_id", "url")
    val got = robotsAllowed(docs, robotsRules(robots))
      .collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
  }

  test("parseCrawlDelayMs: *-group only, decimal-exact ms, min wins, garbage skipped") {
    assert(parseCrawlDelayMs("User-agent: *\nCrawl-delay: 5\n") == Some(5000L))
    // decimal seconds parse digit-wise, never through a float
    assert(parseCrawlDelayMs("User-agent: *\nCrawl-delay: 2.5\n") == Some(2500L))
    assert(parseCrawlDelayMs("User-agent: *\nCrawl-delay: 0.125\n") == Some(125L))
    assert(parseCrawlDelayMs("User-agent: *\nCrawl-delay: 0.1259\n") == Some(125L))
    // a named-agent group's delay does not apply
    assert(parseCrawlDelayMs("User-agent: badbot\nCrawl-delay: 9\n").isEmpty)
    // repeated fields: the conservative minimum wins
    assert(parseCrawlDelayMs(
      "User-agent: *\nCrawl-delay: 10\n\nUser-agent: *\nCrawl-delay: 3\n") == Some(3000L))
    // malformed values skip; NULL body parses to none
    assert(parseCrawlDelayMs("User-agent: *\nCrawl-delay: soon\n").isEmpty)
    assert(parseCrawlDelayMs(null).isEmpty)
    val got = crawlDelayBudget(Seq(
        ("a.com", "User-agent: *\nCrawl-delay: 5\n"),
        ("b.com", "User-agent: *\nDisallow: /\n"),
        (null.asInstanceOf[String], "User-agent: *\nCrawl-delay: 1\n"))
      .toDF("host", "robots_txt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a.com", 5000L, 17280L)), got.toString)
  }

  test("robotsAllowedAsOf: each fetch judged against the policy in force AT FETCH TIME") {
    val versions = Seq(
      // a.com: restrictive at 100, permissive (rule-less) at 500 — the
      // later empty version must SUPERSEDE, not vanish
      ("a.com", 100L, "User-agent: *\nDisallow: /\n"),
      ("a.com", 500L, "User-agent: *\nDisallow:\n"),
      // b.com: permissive then restrictive — a later Disallow must not
      // retroactively taint the earlier fetch
      ("b.com", 100L, "User-agent: *\nDisallow:\n"),
      ("b.com", 500L, "User-agent: *\nDisallow: /x\n"),
      // c.com: NULL body observation (absent robots) after a Disallow
      ("c.com", 100L, "User-agent: *\nDisallow: /\n"),
      ("c.com", 500L, null.asInstanceOf[String])
    ).toDF("host", "version_ts", "robots_txt")
    val docs = Seq(
      (1L, "https://a.com/p", 200L),   // under the Disallow: / version
      (2L, "https://a.com/p", 600L),   // the rule-less version is in force
      (3L, "https://b.com/x/1", 200L), // lawful when fetched
      (4L, "https://b.com/x/1", 600L), // unlawful under the new policy
      (5L, "https://c.com/q", 600L),   // NULL-body version supersedes
      (6L, "https://a.com/p", 50L),    // predates any observation
      (7L, "not a url", 600L)          // unparseable provenance
    ).toDF("doc_id", "url", "fetch_ts")
    val got = Robots.robotsAllowedAsOf(docs, versions)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(2), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((false, 100L)), 2L -> ((true, 500L)),
      3L -> ((true, 100L)), 4L -> ((false, 500L)),
      5L -> ((true, 500L)), 6L -> ((true, -1L)), 7L -> ((true, -1L))), got.toString)
  }

  test("matching is over path + query (RFC 9309) and a NULL body is allow-all") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /search?q=\n"),
      ("b.com", null.asInstanceOf[String])).toDF("host", "robots_txt")
    val rules = robotsRules(robots)
    // NULL body parses to no rules; NULL host emits none
    assert(rules.where(col("host") === "b.com").count() == 0)
    assert(robotsRules(Seq((null.asInstanceOf[String], "User-agent: *\nDisallow: /\n"))
      .toDF("host", "robots_txt")).count() == 0)
    val docs = Seq(
      (1L, "https://a.com/search?q=foo"),  // query participates in the prefix match
      (2L, "https://a.com/search"),        // bare path: rule does not match
      (3L, "https://b.com/anything")       // NULL policy -> allow
    ).toDF("doc_id", "url")
    val got = robotsAllowed(docs, rules)
      .collect().map(x => (x.getLong(0), (x.getBoolean(2), x.getLong(3)))).toMap
    assert(got == Map(1L -> ((false, 10L)), 2L -> ((true, -1L)), 3L -> ((true, -1L))))
  }

  test("RFC 9309 pattern matching: * wildcards, trailing $ anchor, prefix tail, precedence by pattern octets") {
    import graft.functions.RobotsMatchKernel
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def m(path: String, pat: String) = RobotsMatchKernel.matches(u(path), u(pat))
    // plain prefixes degrade to startswith exactly
    assert(m("/private/x", "/private") && !m("/pub/x", "/private"))
    // $ anchors; * spans; interior $ is literal
    assert(m("/a/doc.pdf", "/*.pdf$") && !m("/a/doc.pdfx", "/*.pdf$"))
    assert(m("/tmp/a/x", "/tmp/*/x") && m("/tmp/a/xy", "/tmp/*/x") && !m("/tmq/a/x", "/tmp/*/x"))
    assert(m("/a$b/c", "/a$b") && !m("/ab/c", "/a$b"))
    // empty pattern matches everything; bare $ only the empty target
    assert(m("/anything", "") && m("", "$") && !m("/x", "$"))
    // multi-star backtracking
    assert(m("/aXbYbZc", "/a*b*c$") && !m("/aXbYbZ", "/a*b*c$"))
    // literal markers (a rule's %2A/%24, stored by normalizeRule):
    // match exactly the raw */$ target octet, never act as specials,
    // and a trailing literal dollar is NOT the anchor
    val ls = graft.functions.RobotsMatchKernel.LiteralStar.toChar
    val ld = graft.functions.RobotsMatchKernel.LiteralDollar.toChar
    assert(m("/x*y", s"/x${ls}y") && m("/x*y/z", s"/x${ls}y"))
    assert(!m("/xQy", s"/x${ls}y"), "a literal star must not wildcard")
    assert(m("/p$q", s"/p${ld}q") && !m("/pq", s"/p${ld}q"))
    assert(m("/e$x", s"/e$ld") && !m("/e", s"/e$ld"),
      "a literal dollar keeps prefix semantics — not the anchor")
    assert(m("/e*", s"/e$ls$$") && !m("/e*x", s"/e$ls$$"),
      "literal star composes with the real anchor")

    // the decision fold: longer allow exception beats the $-ban
    val rules = Seq(
      ("h.com", "/*.pdf$", false), ("h.com", "/pub/*.pdf$", true)).toDF("host", "prefix", "allow")
    val docs = Seq(
      (1L, "https://h.com/a/doc.pdf"), (2L, "https://h.com/pub/doc.pdf"),
      (3L, "https://h.com/a/doc.pdfx")).toDF("doc_id", "url")
    val got = robotsAllowed(docs, rules)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((false, 7L)), 2L -> ((true, 11L)), 3L -> ((true, -1L))), got.toString)
  }

  test("fetchSchedule: slots by URL order per host; declared delay beats default; NULL hosts visible at slot 1") {
    val candidates = Seq(
      (Option("slow.com"), "https://slow.com/b"),
      (Option("slow.com"), "https://slow.com/a"),
      (Option("fast.org"), "https://fast.org/x"),
      (Option("fast.org"), "https://fast.org/y"),
      (Option("fast.org"), "https://fast.org/z"),
      (Option.empty[String], "weird://one"),
      (Option.empty[String], "weird://two")).toDF("host", "url")
    val budgets = Seq(("slow.com", 5000L)).toDF("host", "delay_ms")
    val got = fetchSchedule(candidates, budgets, defaultDelayMs = 250L)
      .collect().map(r => r.getString(1) ->
        ((Option(r.getString(0)), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "https://slow.com/a" -> ((Some("slow.com"), 1L, 0L)),
      "https://slow.com/b" -> ((Some("slow.com"), 2L, 5000L)),
      "https://fast.org/x" -> ((Some("fast.org"), 1L, 0L)),
      "https://fast.org/y" -> ((Some("fast.org"), 2L, 250L)),
      "https://fast.org/z" -> ((Some("fast.org"), 3L, 500L)),
      "weird://one" -> ((None, 1L, 0L)),
      "weird://two" -> ((None, 1L, 0L))), s"got $got")
  }

  test("RFC 9309 2.2.2 percent-encoding: rules and targets meet decoded; %2F stays distinct; hostile rules capped") {
    import graft.functions.RobotsPctNormKernel.{normalizeRule => nzr}
    import graft.functions.RobotsMatchKernel.{LiteralDollar, LiteralStar}
    def nz(s: String): String = graft.functions.RobotsPctNormKernel
      .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    // kernel contract, target mode: decode all but %2F
    // (uppercase-canonical), %2A/%24 to the raw octets, malformed
    // escapes verbatim, %-free input identity
    assert(nz("/caf%C3%A9") == "/caf\u00e9" && nz("/caf%c3%a9") == "/caf\u00e9")
    assert(nz("/a%2fb") == "/a%2Fb" && nz("/a%2Fb") == "/a%2Fb")
    assert(nz("/x%2ay%24z") == "/x*y$z")
    assert(nz("/sp%20ace") == "/sp ace")
    assert(nz("/bad%zz") == "/bad%zz" && nz("/end%2") == "/end%2" && nz("/plain") == "/plain")
    // rule mode: %2A/%24 become the matcher's LITERAL markers (one
    // octet each \u2014 most-octets precedence counts them exactly), raw
    // specials pass through untouched
    assert(nzr("/x%2ay%24z") ==
      s"/x${LiteralStar.toChar}y${LiteralDollar.toChar}z")
    assert(nzr("/a*b$") == "/a*b$" && nzr("/a%2fb") == "/a%2Fb")
    // %01/%02 stay encoded BOTH sides (markers unreachable from
    // decode): the two sides still meet byte-equal
    assert(nzr("/c%01d%02") == "/c%01d%02" && nz("/c%01d%02") == "/c%01d%02")
    // parse-time rules normalization: divergent spellings of one octet
    // sequence meet, and precedence ranks by OCTETS of the decoded rule
    val prules = robotsRules(Seq(
      ("h.com", "User-agent: *\nDisallow: /caf%C3%A9\nAllow: /caf%c3%a9/pub\nDisallow: /a%2fb\n"))
      .toDF("host", "robots_txt"))
    val docs = Seq(
      (1L, "https://h.com/caf\u00e9/x"),      // raw UTF-8 target vs encoded rule
      (2L, "https://h.com/caf%C3%A9/pub/ok"), // encoded target; the longer Allow wins
      (3L, "https://h.com/a%2Fb/y"),          // kept escape meets the lowercase rule spelling
      (4L, "https://h.com/a/b/y")             // literal slash never matches %2F
    ).toDF("doc_id", "url")
    val got = robotsAllowed(docs, prules)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((false, 6L)), 2L -> ((true, 10L)),
      3L -> ((false, 6L)), 4L -> ((true, -1L))), got.toString)
    // an over-cap (hostile multi-star) rule drops at parse time; its
    // neighbors survive
    val hostile = "User-agent: *\nDisallow: /" + "*a" * MaxRulePatternBytes +
      "\nDisallow: /keep\n"
    assert(parseRobots("h.com", hostile).map(_.prefix) == Seq("/keep"))
    // the cap is UTF-8 OCTETS, not chars: 1024 two-byte chars = 2048
    // bytes (in-cap) survives; 1025 (2050 bytes, but only 1026 chars)
    // drops — the quadratic matcher's bound is over bytes
    val twoByte = "é"
    val atCap = "User-agent: *\nDisallow: /" + twoByte * 1023 + "\n" // 1 + 2·1023 = 2047 bytes
    assert(parseRobots("h.com", atCap).size == 1)
    val overCap = "User-agent: *\nDisallow: /" + twoByte * 1024 +
      "\nDisallow: /keep\n" // 1 + 2·1024 = 2049 bytes > 2048, though only 1025 chars
    assert(parseRobots("h.com", overCap).map(_.prefix) == Seq("/keep"))
  }

  test("raw C0 control bytes in rule values drop at parse time — literal markers unreachable from any input") {
    import graft.functions.RobotsMatchKernel.{LiteralDollar, LiteralStar}
    // a smuggled raw 0x01 (the LiteralStar marker byte) must NOT become
    // a literal-'*' matcher: the malformed rule drops whole (RFC 9309's
    // path-pattern grammar excludes CTL octets); neighbors survive
    val smuggled = s"User-agent: *\nDisallow: /x${LiteralStar.toChar}y\n" +
      s"Disallow: /p${LiteralDollar.toChar}q\nDisallow: /tab\tz\nDisallow: /keep\n"
    assert(parseRobots("h.com", smuggled).map(_.prefix) == Seq("/keep"))
    // the COMMON authoring artifact — a tab before a trailing comment —
    // is NOT an interior control byte: comment-strip + trim remove it
    // first and the rule SURVIVES (the drop is never permissive here)
    assert(parseRobots("h.com", "User-agent: *\nDisallow: /private\t# staging\n")
      .map(_.prefix) == Seq("/private"))
    // consequence: no stored pattern can carry the marker bytes except
    // via the normalizer's own %2A/%24 decode — a crawl of a raw-'*'
    // URL is judged ONLY by genuine %2A rules, never by marker forgery
    val prules = robotsRules(Seq(
      ("h.com", s"User-agent: *\nDisallow: /a${LiteralStar.toChar}b\nDisallow: /c%2Ad\n"))
      .toDF("host", "robots_txt"))
    val docs = Seq((1L, "https://h.com/a*b"), (2L, "https://h.com/c*d"))
      .toDF("doc_id", "url")
    val got = robotsAllowed(docs, prules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> false), got.toString)
    // %01/%02 ESCAPES still parse fine (they stay encoded — not raw
    // control bytes) and keep matching their own spelling
    assert(parseRobots("h.com", "User-agent: *\nDisallow: /c%01d\n").map(_.prefix)
      == Seq("/c%01d"))
  }
}
