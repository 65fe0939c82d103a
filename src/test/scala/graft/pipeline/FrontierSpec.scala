package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("frontierPriority: rank + reason + saturating age - trap share, exact ppm; unknown reason NULL") {
    val cands = Seq(
      ("https://a.com/x", "discovered"),
      ("https://a.com/y?id=3", "sitemap"),
      ("https://a.com/z", "recrawl"),
      ("https://b.org/w", "discovered"),
      ("https://a.com/q", "weird")
    ).toDF("url", "reason")
    val ranks = Seq(("a.com", 400000L)).toDF("domain", "rank_ppm")
    val ages = Seq(("https://a.com/z", 500L), ("https://a.com/z", 200L)) // dup: max wins
      .toDF("url", "age_ms")
    val shares = Seq(("a.com", "/x", 300000L)).toDF("host", "template", "share_ppm")
    val got = Frontier.frontierPriority(cands, ranks, Some(ages), Some(shares),
        defaultRankPpm = 150000L, ageScaleMs = 1000L, reasonWeightPpm = 500000L)
      .select("url", "priority")
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(
      "https://a.com/x" -> Some(100000L),       // 400000 - 300000 trap share
      "https://a.com/y?id=3" -> Some(900000L),  // 400000 + 1*500000
      "https://a.com/z" -> Some(1900000L),      // 400000 + 2*500000 + age 500000
      "https://b.org/w" -> Some(150000L),       // default rank
      "https://a.com/q" -> None), s"got $got")  // unknown reason stays visible as NULL
    // the age term saturates at 1e6
    val sat = Frontier.frontierPriority(
        Seq(("https://a.com/z", "recrawl")).toDF("url", "reason"),
        ranks, Some(Seq(("https://a.com/z", 999999999L)).toDF("url", "age_ms")),
        None, defaultRankPpm = 150000L, ageScaleMs = 1000L)
      .select("priority").collect().head.getLong(0)
    assert(sat == 400000L + 1000000L + 1000000L, s"got $sat")
  }

  test("fetchScheduleByPriority: per-host top-k by (priority DESC, url); slots keep politeness spacing; WindowGroupLimit prunes") {
    val cands = Seq(
      ("a.com", "https://a.com/x", Some(100000L)),
      ("a.com", "https://a.com/y", Some(900000L)),
      ("a.com", "https://a.com/z", Some(1900000L)),
      ("a.com", "https://a.com/q", Option.empty[Long]), // NULL priority sorts last
      ("b.org", "https://b.org/w", Some(150000L))
    ).toDF("host", "url", "priority")
    val budgets = Seq(("a.com", 100L)).toDF("host", "delay_ms")
    val sched = Frontier.fetchScheduleByPriority(cands, budgets, maxPerHost = 3)
    val got = sched.collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "https://a.com/z" -> ((1L, 0L)),
      "https://a.com/y" -> ((2L, 100L)),
      "https://a.com/x" -> ((3L, 200L)),          // NULL-priority q capped out at slot 4
      "https://b.org/w" -> ((1L, 0L))), s"got $got")
    // the budget filter must rewrite to the map-side top-k prune
    val plan = sched.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"slot<=k over row_number must prune map-side:\n${plan.take(2000)}")
    // NULL-host candidates stay visible at slot 1 / not_before 0
    val nh = Frontier.fetchScheduleByPriority(
        Seq((Option.empty[String], "notaurl", 5L)).toDF("host", "url", "priority"),
        budgets, maxPerHost = 1)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(nh.toSeq == Seq((None, "notaurl", 1L, 0L)), s"got ${nh.toSeq}")
    // validation failures report the operator the CALLER invoked, not
    // the shared fetchSchedule kernel it delegates to
    val bad = intercept[IllegalArgumentException](
      Frontier.fetchScheduleByPriority(cands, budgets, maxPerHost = 0))
    assert(bad.getMessage.contains("fetchScheduleByPriority:"), bad.getMessage)
  }

  test("frontierPriority fast paths: ageCol == dueAges on unique-url cands; " +
    "sitemapPrioritiesUnique == folded on a one-row-per-url table") {
    // unique-url cands carrying their own age column (the r21
    // scan-side path) must score identically to the dueAges table form
    val cands = Seq(
      ("https://a.com/x", "discovered", 0L),
      ("https://a.com/z", "recrawl", 500L),
      ("https://b.org/w", "sitemap", 0L)
    ).toDF("url", "reason", "age_ms")
    val ranks = Seq(("a.com", 400000L)).toDF("domain", "rank_ppm")
    val smp = Seq(("https://b.org/w", 800000L)).toDF("url", "priority_ppm")
    def scores(df: org.apache.spark.sql.DataFrame) = df.select("url", "priority")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaTable = scores(Frontier.frontierPriority(
      cands.select("url", "reason"), ranks,
      dueAges = Some(cands.select("url", "age_ms")),
      sitemapPriorities = Some(smp),
      defaultRankPpm = 150000L, ageScaleMs = 1000L))
    val viaCol = scores(Frontier.frontierPriority(
      cands, ranks,
      sitemapPriorities = Some(smp),
      defaultRankPpm = 150000L, ageScaleMs = 1000L,
      ageCol = Some("age_ms"), sitemapPrioritiesUnique = true))
    assert(viaCol == viaTable, s"ageCol path diverged: $viaCol vs $viaTable")
    // passing both forms is a contract violation, refused loudly
    val both = intercept[IllegalArgumentException](Frontier.frontierPriority(
      cands, ranks, dueAges = Some(cands.select("url", "age_ms")),
      ageCol = Some("age_ms")))
    assert(both.getMessage.contains("EITHER ageCol"), both.getMessage)
    // a missing ageCol column is refused by name
    val miss = intercept[IllegalArgumentException](Frontier.frontierPriority(
      cands.select("url", "reason"), ranks, ageCol = Some("age_ms")))
    assert(miss.getMessage.contains("age_ms"), miss.getMessage)
  }

  test("frontierPriority trapSharesFromCands == crawlTraps(cands) joined back, " +
    "NULL hosts score 0, both-form refusal") {
    // a trap-shaped host (4 of 5 urls in one template) + a flat host +
    // a NULL-host candidate
    val cands = Seq(
      "https://t.com/cal/2024/01/01", "https://t.com/cal/2024/01/02",
      "https://t.com/cal/2024/02/03", "https://t.com/cal/2025/04/05",
      "https://t.com/about",
      "https://flat.org/a", "https://flat.org/b",
      "notaurl"
    ).toDF("url").withColumn("reason", lit("discovered"))
    val ranks = Seq(("t.com", 400000L)).toDF("domain", "rank_ppm")
    def scores(df: org.apache.spark.sql.DataFrame) = df.select("url", "priority")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaTable = scores(Frontier.frontierPriority(cands, ranks,
      trapShares = Some(UrlOps.crawlTraps(cands, urlsUnique = true))))
    val inPlace = scores(Frontier.frontierPriority(cands, ranks,
      trapSharesFromCands = true))
    assert(inPlace == viaTable, s"in-place trap shares diverged: $inPlace vs $viaTable")
    // the trap pool really bites: the /cal/N/N/N urls pay 4/5 of t.com
    assert(inPlace("https://t.com/cal/2024/01/01") ==
      400000L + 0L - 800000L, s"got $inPlace")
    val both = intercept[IllegalArgumentException](Frontier.frontierPriority(
      cands, ranks, trapShares = Some(UrlOps.crawlTraps(cands)),
      trapSharesFromCands = true))
    assert(both.getMessage.contains("EITHER trapSharesFromCands"), both.getMessage)
  }

  test("spark.graft.checkContracts guards the uniqueness fast paths: " +
    "fires on duplicate urls, silent + plan-invisible when off") {
    val ranks = Seq(("a.com", 400000L)).toDF("domain", "rank_ppm")
    val dup = Seq(
      ("https://a.com/x", "discovered", 0L),
      ("https://a.com/x", "discovered", 0L),
      ("https://a.com/y", "discovered", 0L)
    ).toDF("url", "reason", "age_ms")
    val uniq = dup.dropDuplicates("url")
    // OFF (default): no guard expression in the plan, dup input silently
    // takes the fast path (the documented caller contract)
    val offPlan = Frontier.frontierPriority(dup, ranks, ageCol = Some("age_ms"),
      trapSharesFromCands = true).queryExecution.executedPlan.toString
    assert(!offPlan.contains("assert_true") && !offPlan.contains("__ckn"),
      "guard must be plan-invisible when the conf is off")
    spark.conf.set("spark.graft.checkContracts", "true")
    try {
      // ON + unique input: values identical to the guard-off run
      val okOn = Frontier.frontierPriority(uniq, ranks, ageCol = Some("age_ms"),
        trapSharesFromCands = true).select("url", "priority").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.graft.checkContracts", "false")
      val okOff = Frontier.frontierPriority(uniq, ranks, ageCol = Some("age_ms"),
        trapSharesFromCands = true).select("url", "priority").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.graft.checkContracts", "true")
      assert(okOn == okOff, s"guard changed values: $okOn vs $okOff")
      // ON + duplicate input: the cands guard fires
      val e1 = intercept[Exception](Frontier.frontierPriority(dup, ranks,
        ageCol = Some("age_ms"), trapSharesFromCands = true).collect())
      assert(e1.getMessage != null && e1.getMessage.contains("one row per url"),
        s"wanted the contract message, got: ${e1.getMessage}")
      // ON + duplicate sitemapPriorities under sitemapPrioritiesUnique
      val spDup = Seq(("https://a.com/y", 1L), ("https://a.com/y", 2L))
        .toDF("url", "priority_ppm")
      val e2 = intercept[Exception](Frontier.frontierPriority(uniq, ranks,
        sitemapPriorities = Some(spDup), sitemapPrioritiesUnique = true).collect())
      assert(e2.getMessage != null && e2.getMessage.contains("one row per url"),
        s"wanted the contract message, got: ${e2.getMessage}")
      // ON + duplicate urls under crawlTraps(urlsUnique = true)
      val e3 = intercept[Exception](
        UrlOps.crawlTraps(dup.select("url"), urlsUnique = true).collect())
      assert(e3.getMessage != null && e3.getMessage.contains("one row per url"),
        s"wanted the contract message, got: ${e3.getMessage}")
      // ON + unique urls: crawlTraps passes
      assert(UrlOps.crawlTraps(uniq.select("url"), urlsUnique = true).count() > 0)
    } finally spark.conf.set("spark.graft.checkContracts", "false")
  }
}
