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

  test("recrawlDue 304 arm: NULL-hash fetches extend gaps without minting change events") {
    val n = null.asInstanceOf[String]
    val fh = Seq(
      // a: content h0, a 304, content h1 — ONE gap of 200 (the 304
      // extends it, never splits it), nc=2, nf=3
      ("https://a.com/x", 0L, "h0"), ("https://a.com/x", 100L, n),
      ("https://a.com/x", 200L, "h1"),
      // b: content once then trailing 304s — static (nc=1, the default
      // arm); next_due still advances from the LAST 304
      ("https://b.com/y", 0L, "s"), ("https://b.com/y", 50L, n),
      ("https://b.com/y", 90L, n),
      // c: a LEADING 304 then content — the first CONTENT fetch is the
      // change event, the bare 304 is not
      ("https://c.com/z", 10L, n), ("https://c.com/z", 20L, "s")
    ).toDF("url", "fetch_ts", "content_hash")
    val got = Recrawl.recrawlDue(fh, None,
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      "https://a.com/x" -> ((3L, 2L, 200L, 400L)),
      "https://b.com/y" -> ((3L, 1L, 1000L, 1090L)),
      "https://c.com/z" -> ((2L, 1L, 1000L, 1020L))), s"got $got")
  }

  test("recrawlDue changefreq prior: explicit cadence beats lastmod age, observed median beats both, duplicates collapse min") {
    val fh = Seq(
      ("https://a.com/x", 100L, "s"), ("https://a.com/x", 300L, "s"), // static
      ("https://b.com/y", 0L, "h0"), ("https://b.com/y", 70L, "h1")   // gap 70
    ).toDF("url", "fetch_ts", "content_hash")
    val lm = Seq(("https://a.com/x", 40L)).toDF("url", "lastmod_ts")
    val cf = Seq(
      ("https://a.com/x", 120L), ("https://a.com/x", 200L), // min elects 120
      ("https://b.com/y", 500L)
    ).toDF("url", "changefreq_ms")
    val got = Recrawl.recrawlDue(fh, Some(lm), changefreqs = Some(cf),
        defaultIntervalMs = 1000L, minIntervalMs = 50L)
      .collect().map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      // a: the cadence claim (min 120) beats the lastmod age (300-40=260)
      "https://a.com/x" -> ((120L, 420L)),
      // b: the observed median (70) beats the cadence claim (500)
      "https://b.com/y" -> ((70L, 140L))), s"got $got")
  }

  test("recrawlState: the exact stream state at rest — filled hashes, chronological last-maxGaps gaps, cold-start zeros") {
    val n = null.asInstanceOf[String]
    val fh = Seq(
      // a: changes at 0, 100, 180, 300 (gaps 100, 80, 120) with a 304
      // inside — maxGaps=2 keeps the LAST two chronologically [80, 120]
      ("https://a.com/x", 0L, "h0"), ("https://a.com/x", 100L, "h1"),
      ("https://a.com/x", 150L, n), ("https://a.com/x", 180L, "h2"),
      ("https://a.com/x", 300L, "h3"),
      // b: only 304s — no content hash, no change, the stream's
      // cold-start zeros with the fetch count advanced
      ("https://b.com/y", 5L, n), ("https://b.com/y", 9L, n)
    ).toDF("url", "fetch_ts", "content_hash")
    val got = Recrawl.recrawlState(fh, maxGaps = 2).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getSeq[Long](5).toSeq))).toMap
    assert(got == Map(
      "https://a.com/x" -> ((Some("h3"), 300L, 5L, 4L, Seq(80L, 120L))),
      "https://b.com/y" -> ((None, 0L, 2L, 0L, Seq.empty[Long]))), s"got $got")
  }

  test("fetchValidators: most recent CARRYING fetch wins per validator; trailing 304s look back") {
    val n = null.asInstanceOf[String]
    val fh = Seq(
      // u1: etag only on the first content fetch; later fetches (a bare
      // 304, then a 304 that refreshes Last-Modified) carry none — the
      // election must surface ("e1", lm-a) from different rows
      ("u1", 0L, "h0", "\"e1\"", n), ("u1", 10L, n, n, n),
      ("u1", 20L, n, n, "lm-a"),
      // u2: no validators ever — both NULL, visible
      ("u2", 5L, "h", n, n),
      // u3: a refreshed etag supersedes the old one
      ("u3", 1L, "h0", "\"old\"", n), ("u3", 9L, "h1", "\"new\"", n)
    ).toDF("url", "fetch_ts", "content_hash", "etag", "last_modified")
    val got = Recrawl.fetchValidators(fh).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3)))).toMap
    assert(got == Map(
      "u1" -> ((Some("\"e1\""), Some("lm-a"), 20L)),
      "u2" -> ((None, None, 5L)),
      "u3" -> ((Some("\"new\""), None, 9L))), s"got $got")
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
