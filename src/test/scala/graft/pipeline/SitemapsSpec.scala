package graft.pipeline

import graft.SparkSpec

class SitemapsSpec extends SparkSpec {
  import spark.implicits._
  import Sitemaps._

  test("parseSitemap: roots, entries, case/attribute tolerance, loc-less entries, malformed bodies") {
    val (idx, es) = parseSitemap(
      """<?xml version="1.0"?><SiteMapIndex xmlns="x"><sitemap><loc> https://a.com/s1.xml </loc>""" +
        "<lastmod>2024-01-01</lastmod></sitemap><sitemap><lastmod>2024</lastmod></sitemap>" +
        "<sitemap><loc>https://a.com/s2.xml</loc></sitemap></SiteMapIndex>")
    assert(idx, "mixed-case sitemapindex root must be recognized")
    assert(es == Seq(("https://a.com/s1.xml", Some("2024-01-01")),
      ("https://a.com/s2.xml", None)), s"got $es")
    val (pg, ps) = parseSitemap(
      "<urlset><url><loc>/p1</loc></url><URL><LOC>/p2</LOC></URL></urlset>")
    assert(!pg && ps == Seq(("/p1", None), ("/p2", None)), s"got $ps")
    assert(parseSitemap(null) == ((false, Nil)))
    assert(parseSitemap("not xml at all") == ((false, Nil)))
    assert(parseSitemap("<html><body>404 page</body></html>") == ((false, Nil)))
    // an unclosed trailing entry still yields its loc
    assert(parseSitemap("<urlset><url><loc>/x</loc>")._2 == Seq(("/x", None)))
  }

  test("sitemapPageUrls: declared seeds only, one index hop, same-host rule, decode/resolve/canonicalize, max-lastmod") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow:\nSitemap: https://a.com/sm.xml\n" +
        "Sitemap: https://a.com/news.xml\n"),
      ("b.org", "User-agent: *\nSitemap: https://b.org/idx.xml\n")).toDF("host", "robots_txt")
    val bodies = Seq(
      // pages: entity-encoded query (decodes + param-sorts), relative loc
      // (resolves against the sitemap's own URL), cross-host loc (drops)
      ("a.com", "https://a.com/sm.xml",
        "<urlset><url><loc>https://a.com/p?b=2&amp;a=1</loc><lastmod>2024-01-01</lastmod></url>" +
          "<url><loc>/rel</loc></url><url><loc>https://evil.net/x</loc></url></urlset>"),
      // RE-lists /rel with a lastmod: the max election must surface it
      ("a.com", "https://a.com/news.xml",
        "<urlset><url><loc>https://a.com/rel</loc><lastmod>2024-06-06</lastmod></url></urlset>"),
      // present in the fetch store but never declared: must not surface
      ("a.com", "https://a.com/rogue.xml",
        "<urlset><url><loc>https://a.com/rogue</loc></url></urlset>"),
      // index -> urlset child (read) and index -> index child (the
      // depth bound drops its grandchildren)
      ("b.org", "https://b.org/idx.xml",
        "<sitemapindex><sitemap><loc>https://b.org/c1.xml</loc></sitemap>" +
          "<sitemap><loc>https://b.org/c2.xml</loc></sitemap></sitemapindex>"),
      ("b.org", "https://b.org/c1.xml",
        "<urlset><url><loc>https://b.org/deep</loc></url></urlset>"),
      ("b.org", "https://b.org/c2.xml",
        "<sitemapindex><sitemap><loc>https://b.org/c3.xml</loc></sitemap></sitemapindex>"),
      ("b.org", "https://b.org/c3.xml",
        "<urlset><url><loc>https://b.org/never</loc></url></urlset>")
    ).toDF("host", "sitemap_url", "body")
    val got = sitemapPageUrls(robots, bodies).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("a.com", "https://a.com/p?a=1&b=2", Some("2024-01-01")),
      ("a.com", "https://a.com/rel", Some("2024-06-06")),
      ("b.org", "https://b.org/deep", None)), s"got $got")
  }
}
