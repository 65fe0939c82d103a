package graft.pipeline

import graft.SparkSpec

class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  test("recrawlDue: median/prior/default arms, min clamp, future lastmod falls due immediately") {
    val fh = Seq(
      // a: changes at 0, 100, 250 (gaps 100, 150) -> lower median 100
      ("https://a.com/x", 0L, "h0"), ("https://a.com/x", 100L, "h1"),
      ("https://a.com/x", 180L, "h1"), ("https://a.com/x", 250L, "h2"),
      // b: static, lastmod prior 40 -> est = 300 - 40 = 260
      ("https://b.com/y", 200L, "s"), ("https://b.com/y", 300L, "s"),
      // c: static, no prior -> the caller default
      ("https://c.com/z", 10L, "s"), ("https://c.com/z", 20L, "s"),
      // d: changes every fetch at gap 3 -> clamped to the minimum
      ("https://d.com/w", 0L, "x0"), ("https://d.com/w", 3L, "x1"),
      ("https://d.com/w", 6L, "x2"),
      // e: single fetch with a FUTURE lastmod (publisher claims a change
      // since we read it): clamps to the minimum, falls due immediately
      ("https://e.com/v", 100L, "s")
    ).toDF("url", "fetch_ts", "content_hash")
    val lm = Seq(("https://b.com/y", 40L), ("https://e.com/v", 500L))
      .toDF("url", "lastmod_ts")
    val got = Recrawl.recrawlDue(fh, Some(lm),
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      "https://a.com/x" -> ((4L, 3L, 100L, 350L)),
      "https://b.com/y" -> ((2L, 1L, 260L, 560L)),
      "https://c.com/z" -> ((2L, 1L, 1000L, 1020L)),
      "https://d.com/w" -> ((3L, 3L, 50L, 56L)),
      "https://e.com/v" -> ((1L, 1L, 50L, 150L))), s"got $got")
    // host column rides along; unparseable provenance stays visible
    val host = Recrawl.recrawlDue(
        Seq(("mailto:u@x.com", 1L, "s")).toDF("url", "fetch_ts", "content_hash"),
        None, defaultIntervalMs = 100L, minIntervalMs = 10L)
      .collect().map(r => (Option(r.getString(1)), r.getLong(4), r.getLong(5)))
    assert(host.toSeq == Seq((None, 100L, 101L)), s"got ${host.toSeq}")
  }

  test("recrawlDue: duplicate-url lastmods rows collapse to one min prior, never fan the queue") {
    val fh = Seq(
      ("https://b.com/y", 200L, "s"), ("https://b.com/y", 300L, "s")
    ).toDF("url", "fetch_ts", "content_hash")
    // three prior rows for one url (a joined prior table with history);
    // min(40, 90, 120) = 40 is the deterministic election — est stays
    // 300 - 40 = 260 and the queue holds exactly ONE row for the url
    val lm = Seq(
      ("https://b.com/y", 90L), ("https://b.com/y", 40L), ("https://b.com/y", 120L)
    ).toDF("url", "lastmod_ts")
    val got = Recrawl.recrawlDue(fh, Some(lm),
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("https://b.com/y", 260L, 560L)), s"got ${got.toSeq}")
  }
}
