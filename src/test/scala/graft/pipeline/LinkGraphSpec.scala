package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extractLinks: both quote styles, attributes between, scoping visible") {
    val html =
      """<html><body>
        |<a href="https://a.com/x">double</a>
        |<a class="btn" rel="nofollow" href='https://b.com/y'>single</a>
        |<A HREF="https://c.com/z">uppercase</A>
        |<a href="/relative">rel</a>
        |<a href="mailto:x@y.com">mail</a>
        |<a name="anchor-no-href">none</a>
        |<script>var s = 'href="https://not-an-anchor.com/"';</script>
        |</body></html>""".stripMargin
    val got = LinkGraph.extractLinks(Seq((1L, html)).toDF("doc_id", "html"))
      .select("href").as[String].collect().toSet
    // the script's href lacks an <a prefix and is NOT extracted; the
    // relative and mailto links ARE extracted (they drop later, at the
    // domain stage, where the scoping is visible)
    assert(got == Set("https://a.com/x", "https://b.com/y", "https://c.com/z",
      "/relative", "mailto:x@y.com"))
    // a comment-wrapped anchor IS extracted — the documented
    // approximation every regex extractor shares (same class as
    // MarkupExtract's attr-value '>' caveat)
    val ghost = LinkGraph.extractLinks(
      Seq((1L, """<!-- <a href="https://ghost.com/"> -->""")).toDF("doc_id", "html"))
      .select("href").as[String].collect().toSeq
    assert(ghost == Seq("https://ghost.com/"))
    // no links → no rows (not a null row)
    assert(LinkGraph.extractLinks(Seq((1L, "<p>plain</p>")).toDF("doc_id", "html"))
      .count() == 0L)
  }

  test("extractCanonical: quote styles, attribute order, entities, resolution, scoping") {
    def one(url: String, html: String): Option[String] =
      LinkGraph.extractCanonical(Seq((1L, url, html)).toDF("doc_id", "url", "html"))
        .select("canonical_url").collect().map(r => Option(r.getString(0))).head
    val base = "https://www.site.com/p/7"
    // relative href resolves against the page URL; double quotes
    assert(one(base, """<head><link rel="canonical" href="/p/1"></head>""")
      == Some("https://www.site.com/p/1"))
    // single quotes, href BEFORE rel, dot segments
    assert(one(base, """<link href='../c/9' rel='canonical'>""")
      == Some("https://www.site.com/c/9"))
    // entity-encoded multi-param query decodes, then canonicalizes sorted
    assert(one(base, """<link rel="canonical" href="https://other.com/x?b=2&amp;a=1">""")
      == Some("https://other.com/x?a=1&b=2")) // cross-host KEPT
    // no canonical tag; alternate rel values don't match; empty href
    assert(one(base, """<link rel="stylesheet" href="/s.css">""") == None)
    assert(one(base, """<link rel="canonical" href="">""") == None)
    assert(one(base, "<p>no head</p>") == None)
    // FIRST canonical tag wins
    assert(one(base,
      """<link rel="canonical" href="/first"><link rel="canonical" href="/second">""")
      == Some("https://www.site.com/first"))
    // bad provenance: relative target unresolvable, absolute target survives
    assert(one("mailto:x@y.com", """<link rel="canonical" href="/p/1">""") == None)
    assert(one("mailto:x@y.com", """<link rel="canonical" href="https://a.com/x">""")
      == Some("https://a.com/x"))
  }

  test("extractAnchors: (href, text) pairs in both quote styles; nested tags truncate visibly") {
    val html =
      """<a href="https://a.com/x">plain text</a>
        |<a class="b" href='https://b.com/y'>single quoted</a>
        |<a href="https://c.com/z"><b>bold</b> rest</a>
        |<a href="/rel">relative</a>""".stripMargin
    val got = LinkGraph.extractAnchors(Seq((1L, html)).toDF("doc_id", "html"))
      .select("href", "anchor").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the nested-tag anchor truncates at the inner tag — the documented
    // approximation (empty text here, since <b> opens immediately)
    assert(got == Set(
      ("https://a.com/x", "plain text"),
      ("https://b.com/y", "single quoted"),
      ("https://c.com/z", ""),
      ("/rel", "relative")))
    val stats = LinkGraph.anchorTextStats(
      LinkGraph.extractAnchors(Seq((1L, html)).toDF("doc_id", "html")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // empty-text and no-domain anchors drop from the harvest
    assert(stats == Set(("a.com", "plain text", 1L), ("b.com", "single quoted", 1L)))
  }

  test("linkDomainEdges: suffix reduction, self-edge and no-domain drops, counts") {
    val links = Seq(
      (1L, "https://news.a.co.uk/1", "https://www.b.com/x"),   // a.co.uk -> b.com
      (2L, "https://a.co.uk/2", "https://cdn.b.com/y"),        // same edge again
      (3L, "https://a.co.uk/3", "https://sub.a.co.uk/nav"),    // self-edge: dropped
      (4L, "https://a.co.uk/4", "/relative"),                  // no dst domain
      (5L, "mailto:x@y.com", "https://b.com/z"),               // no src domain
      (6L, "https://u.github.io/", "https://v.github.io/")     // private-suffix pair
    ).toDF("doc_id", "url", "href")
    val got = LinkGraph.linkDomainEdges(links)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a.co.uk", "b.com", 2L),
      ("u.github.io", "v.github.io", 1L)))
  }

  /** Independent reference: the same recurrence over Scala Maps. */
  private def refPageRank(
      edges: Seq[(String, String)], iters: Int, damping: Long): Map[String, Long] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).map { case (s, es) => (s, es.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = 1000000L - damping
    var r = nodes.map(n => (n, 1000000L)).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, in) =>
        (d, in.map { case (s, _) => r(s) / out(s) }.sum)
      }
      r = nodes.map(n => (n, base + damping * contrib.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  private def runPr(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    LinkGraph.pageRankPpm(edges.toDF("src", "dst"), iters)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("pageRankPpm == the independent reference model on structured graphs") {
    // a hub (everyone links to h), a chain, a cycle, a dangling sink
    val graph = Seq(
      "a" -> "h", "b" -> "h", "c" -> "h",        // hub
      "a" -> "b", "b" -> "c",                     // chain
      "x" -> "y", "y" -> "z", "z" -> "x",        // 3-cycle
      "h" -> "sink")                              // sink dangles (no outlinks)
    for (iters <- Seq(1, 3, 5)) {
      val got = runPr(graph, iters)
      val ref = refPageRank(graph, iters, 850000L)
      assert(got == ref, s"iters=$iters: $got vs $ref")
    }
    // the hub outranks its contributors; the closed 3-cycle conserves
    // its full starting mass (1e6 each — no leak, no inflow) and the
    // cycle nodes agree by symmetry
    val r5 = runPr(graph, 5)
    assert(r5("h") > r5("a") && r5("h") > r5("b") && r5("h") > r5("c"), r5.toString)
    assert(r5("x") == 1000000L && r5("y") == 1000000L && r5("z") == 1000000L, r5.toString)
  }

  test("pageRankPpm: parallel edges count once; no-inlink nodes sit at the base") {
    val got = runPr(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 2)
    val ref = refPageRank(Seq("a" -> "b", "a" -> "c"), 2, 850000L)
    assert(got == ref)
    assert(got("a") == 150000L) // nothing links to a
  }

  test("pageRankPpm: deterministic across runs (integer arithmetic, no float drift)") {
    val edges = (0 until 200).map(i => (s"d${i % 17}", s"d${(i * 7 + 3) % 17}"))
    assert(runPr(edges, 5) == runPr(edges, 5))
    assert(runPr(edges, 5) == refPageRank(edges, 5, 850000L))
  }

  test("pageRankPpm: bounds fail fast") {
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](LinkGraph.pageRankPpm(e, iters = 0))
    intercept[IllegalArgumentException](LinkGraph.pageRankPpm(e, dampingPpm = 1000001L))
  }

  /** Independent bounded-radius harmonic reference: BFS from every node
    * over the distinct directed edge set, reciprocal-distance ppm sums
    * TOWARD each target.
    */
  private def refHarmonic(edges: Seq[(String, String)], radius: Int): Map[String, Long] = {
    val e = edges.distinct.filter { case (u, v) => u != v }
    val nodes = e.flatMap { case (u, v) => Seq(u, v) }.distinct
    val adj = e.groupBy(_._1).map { case (u, out) => (u, out.map(_._2)) }
    val score = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    nodes.foreach { u =>
      var frontier = Set(u)
      var seen = Set(u)
      for (d <- 1 to radius) {
        frontier = frontier.flatMap(x => adj.getOrElse(x, Seq.empty)).diff(seen)
        frontier.foreach(v => if (v != u) score(v) += 1000000L / d)
        seen ++= frontier
      }
    }
    nodes.map(n => (n, score(n))).toMap
  }

  private def runHc(edges: Seq[(String, String)], radius: Int): Map[String, Long] =
    LinkGraph.harmonicPpm(edges.toDF("src", "dst"), radius)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("harmonicPpm == the independent BFS reference on structured graphs") {
    val graph = Seq(
      "a" -> "h", "b" -> "h", "c" -> "h",        // hub: 3 at distance 1
      "a" -> "b", "b" -> "c",                     // chain feeding the hub
      "x" -> "y", "y" -> "z", "z" -> "x",        // 3-cycle
      "h" -> "sink")                              // sink: everyone reaches it
    for (radius <- Seq(1, 2, 3)) {
      val got = runHc(graph, radius)
      val ref = refHarmonic(graph, radius)
      assert(got == ref, s"radius=$radius: $got vs $ref")
    }
    val r3 = runHc(graph, 3)
    // hub at radius 3: a,b,c at distance 1 -> 3e6 (a->b->h etc are longer
    // paths to an already-seen node, not counted — min distance wins)
    assert(r3("h") == 3000000L, r3.toString)
    // sink: h at d1, a/b/c at d2, nothing new at d3 (a's chain reaches b,c
    // before their d3 paths) -> 1e6 + 3*5e5
    assert(r3("sink") == 2500000L, r3.toString)
    // cycle nodes: one in-neighbor at each distance 1, 2 -> 1e6 + 5e5 +
    // nothing at 3 (d3 would close the cycle back to the start: excluded)
    assert(r3("x") == 1500000L && r3("y") == 1500000L && r3("z") == 1500000L, r3.toString)
    // never-reached nodes report 0
    assert(runHc(Seq("a" -> "b"), 3)("a") == 0L)
  }

  test("harmonicPpmSketch: equals the exact form while every in-ball is below K") {
    // 20-node random graph: every radius-3 in-ball holds < 16 nodes, so
    // the KMV sets stay below K, the estimator is an exact count, and
    // the sketch must equal the exact form value-for-value — for both
    // mass formulas sum count_at_distance_d * (1e6 DIV d)
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed + 40)
      val edges = Seq.fill(25)((s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      val df = edges.toDF("src", "dst")
      val exact = LinkGraph.harmonicPpm(df).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val sketch = LinkGraph.harmonicPpmSketch(df).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(sketch == exact, s"seed $seed:\n$sketch\nvs exact\n$exact")
    }
  }

  test("harmonicPpmSketch: state stays at K rows per node and the estimate is monotone") {
    // a dense hub: 40 nodes all link to 'hub' and to each other in a
    // ring, so hub's radius-2 ball far exceeds K=4 — the sketch keeps
    // 4 hashes and estimates
    val edges = (0 until 40).flatMap(i =>
      Seq((s"m$i", "hub"), (s"m$i", s"m${(i + 1) % 40}")))
    val df = edges.toDF("src", "dst")
    val got = LinkGraph.harmonicPpmSketch(df, radius = 3, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // the hub's in-ball at radius 1 is all 40 nodes: the K=4 estimate
    // must be positive and roughly in the tens (KMV with K=4 is coarse;
    // determinism is what matters — re-run equals)
    assert(got("hub") > 0L)
    val again = LinkGraph.harmonicPpmSketch(df, radius = 3, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == got, "sketch must be deterministic")
    // contributions never go negative: every node's mass is >= 0
    assert(got.values.forall(_ >= 0L), got.toString)
    intercept[IllegalArgumentException](LinkGraph.harmonicPpmSketch(df, k = 1))
    intercept[IllegalArgumentException](LinkGraph.harmonicPpmSketch(df, radius = 33))
  }

  test("harmonicPpmSketch past radius 6: linear rounds reach where the exact ball bound refuses; below-K stays exact") {
    // a 10-node directed path: distances up to 9 — OUTSIDE harmonicPpm's
    // [1, 6] ball bound (which refuses), but the sketch's fixed-width
    // state makes radius linear rounds. With K=64 every ball stays
    // below K, so the sketch equals the independent BFS reference
    // EXACTLY at radius 8
    val path = (0 until 9).map(i => (s"p$i", s"p${i + 1}"))
    intercept[IllegalArgumentException](
      LinkGraph.harmonicPpm(path.toDF("src", "dst"), radius = 8))
    val got = LinkGraph.harmonicPpmSketch(path.toDF("src", "dst"), radius = 8, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ref = refHarmonic(path, radius = 8)
    assert(got == ref, s"radius-8 sketch diverged from the BFS reference\n$got\n$ref")
    // the far end accumulates all 8 reciprocal distances; past-radius
    // ancestors (p0 at distance 9) stay excluded
    assert(got("p9") == (1 to 8).map(1000000L / _).sum, got.toString)
    // saturation: once every ball stops growing (path diameter 9),
    // extra rounds change nothing
    val more = LinkGraph.harmonicPpmSketch(path.toDF("src", "dst"), radius = 12, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(more("p9") == (1 to 9).map(1000000L / _).sum &&
      more == refHarmonic(path, radius = 12), more.toString)
  }

  test("harmonicPpmSketch: the reliable-checkpoint swap — refuses without a dir, identical results with one") {
    val path = (0 until 5).map(i => (s"r$i", s"r${i + 1}"))
    val plain = LinkGraph.harmonicPpmSketch(path.toDF("src", "dst"), radius = 7, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      // long-lived cluster runs NEED reliable storage: the switch
      // without a checkpoint dir refuses loudly, naming the operator
      val e = intercept[IllegalArgumentException](
        LinkGraph.harmonicPpmSketch(path.toDF("src", "dst"), radius = 7, k = 64))
      assert(e.getMessage.contains("harmonicPpmSketch") &&
        e.getMessage.contains("setCheckpointDir"), e.getMessage)
      // with a dir, the swap changes recovery semantics only — results
      // and every round's truncation are identical
      val ckDir = java.nio.file.Files.createTempDirectory("graft_ck_").toString
      spark.sparkContext.setCheckpointDir(ckDir)
      val reliable = LinkGraph.harmonicPpmSketch(path.toDF("src", "dst"), radius = 7, k = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(reliable == plain, s"reliable swap changed results\n$reliable\n$plain")
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }

  test("harmonicPpm: parallel edges count once; self-loops drop; bounds fail fast") {
    val got = runHc(Seq("a" -> "b", "a" -> "b", "c" -> "c", "c" -> "b"), 2)
    assert(got == Map("a" -> 0L, "b" -> 2000000L, "c" -> 0L), got.toString)
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](LinkGraph.harmonicPpm(e, radius = 0))
    intercept[IllegalArgumentException](LinkGraph.harmonicPpm(e, radius = 7))
  }
}
