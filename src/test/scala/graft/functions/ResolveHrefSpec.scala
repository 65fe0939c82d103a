package graft.functions

import graft.SparkSpec
import graft.pipeline.UrlOps
import org.apache.spark.sql.functions._

class ResolveHrefSpec extends SparkSpec {
  import spark.implicits._

  private def res(base: String, href: String): Option[String] =
    Option(HrefKernel.resolve(
      org.apache.spark.unsafe.types.UTF8String.fromString(base),
      org.apache.spark.unsafe.types.UTF8String.fromString(href))).map(_.toString)

  private val base = "https://www.example.com/a/b/c?bq=1#bfrag"

  test("absolute references pass through (dot segments removed); non-http(s) is NULL") {
    assert(res(base, "https://other.org/x/y") == Some("https://other.org/x/y"))
    assert(res(base, "HTTP://other.org/x/../y") == Some("HTTP://other.org/y"))
    assert(res(base, "https://other.org/x?q=2#frag") == Some("https://other.org/x?q=2"))
    assert(res(base, "mailto:someone@example.com").isEmpty)
    assert(res(base, "javascript:void(0)").isEmpty)
    assert(res(base, "data:text/plain,hi").isEmpty)
    // a colon INSIDE a path segment is not a scheme separator (RFC 3986:
    // the first segment of a relative-path reference may not contain ':'
    // unless dot-prefixed — markup in the wild still emits these)
    assert(res(base, "x/y:z") == Some("https://www.example.com/a/b/x/y:z"))
  }

  test("protocol-relative references take the base scheme") {
    assert(res(base, "//cdn.example.net/lib.js")
      == Some("https://cdn.example.net/lib.js"))
    assert(res("http://h.com/p", "//cdn.example.net/lib.js?v=2")
      == Some("http://cdn.example.net/lib.js?v=2"))
    assert(res(base, "//hostonly.com") == Some("https://hostonly.com"))
    assert(res(base, "//h.com?q=1") == Some("https://h.com?q=1"))
  }

  test("absolute-path references keep the base authority") {
    assert(res(base, "/x/y") == Some("https://www.example.com/x/y"))
    assert(res(base, "/x/../y?q=3") == Some("https://www.example.com/y?q=3"))
  }

  test("relative-path references merge with the base path, dot segments removed") {
    assert(res(base, "d") == Some("https://www.example.com/a/b/d"))
    assert(res(base, "./d") == Some("https://www.example.com/a/b/d"))
    assert(res(base, "../d") == Some("https://www.example.com/a/d"))
    assert(res(base, "../../d") == Some("https://www.example.com/d"))
    // .. above the root clamps at the root (RFC 3986 §5.2.4)
    assert(res(base, "../../../../d") == Some("https://www.example.com/d"))
    assert(res(base, "d/") == Some("https://www.example.com/a/b/d/"))
    assert(res(base, "..") == Some("https://www.example.com/a/"))
    assert(res(base, ".") == Some("https://www.example.com/a/b/"))
    // empty base path merges as root
    assert(res("https://h.com", "d") == Some("https://h.com/d"))
    assert(res("https://h.com?q=1", "d") == Some("https://h.com/d"))
  }

  test("query-only, fragment-only, and empty references") {
    assert(res(base, "?q=9") == Some("https://www.example.com/a/b/c?q=9"))
    // fragment-only and empty are same-document references: base kept,
    // INCLUDING its query, fragment dropped
    assert(res(base, "#sec2") == Some("https://www.example.com/a/b/c?bq=1"))
    assert(res(base, "") == Some("https://www.example.com/a/b/c?bq=1"))
  }

  test("non-http(s)/malformed/NULL base voids RELATIVE refs only; absolute refs resolve without it") {
    assert(res("mailto:x@y.com", "/a").isEmpty)
    assert(res("ftp://h.com/a", "b").isEmpty)
    // RFC 3986 §5.2.2: an absolute reference never consults the base —
    // bad-provenance documents keep their absolute cross-domain edges
    assert(res("not a url", "https://ok.com/x") == Some("https://ok.com/x"))
    assert(res("mailto:x@y.com", "https://ok.com/a/../y?q=1") == Some("https://ok.com/y?q=1"))
    assert(res(null, "https://ok.com/x") == Some("https://ok.com/x"))
    // non-http(s) absolute targets still drop, whatever the base
    assert(res("not a url", "mailto:z@w.org").isEmpty)
    assert(res(null, "/a").isEmpty)
    assert(res(null, "//h.com/p").isEmpty) // protocol-relative needs the base scheme
  }

  test("property: matches java.net.URI.resolve (the JDK's RFC 3986 resolver) on random references") {
    // the JDK resolver is an independent public RFC 3986 implementation;
    // empty and fragment-only references are excluded (JDK quirks around
    // same-document references, unit-tested above), as are non-http(s)
    // results (we NULL them by documented scope)
    val rnd = new scala.util.Random(31)
    def seg(): String = Seq("a", "bb", "ccc", ".", "..", "d9")(rnd.nextInt(6))
    def path(n: Int): String = (1 to n).map(_ => seg()).mkString("/")
    val bases = Seq(
      "https://www.example.com/a/b/c",
      "https://h.org:8080/x/y/",
      "http://example.co.uk/p?bq=1",
      "https://h.com")
    val refs =
      (1 to 40).map(_ => path(1 + rnd.nextInt(3))) ++
      (1 to 40).map(_ => "/" + path(1 + rnd.nextInt(3))) ++
      (1 to 20).map(_ => "//other.net/" + path(1 + rnd.nextInt(2))) ++
      (1 to 20).map(_ => path(1 + rnd.nextInt(2)) + "?q=" + rnd.nextInt(9)) ++
      (1 to 20).map(_ => "https://abs.example/" + path(1 + rnd.nextInt(3)))
    // independent RFC 3986 §5.2.4 reference (segment stack), applied to
    // the JDK's output path: java.net.URI skips dot removal for
    // absolute-path references and PRESERVES above-root '..' in
    // normalize() — both documented JDK deviations from the RFC
    // pseudo-code our kernel follows
    def refDots(p: String): String = {
      if (p.isEmpty) return p
      val abs = p.startsWith("/")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val trailingSlash = p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..") ||
        p == "." || p == ".."
      p.split("/", -1).filter(_.nonEmpty).foreach {
        case "."  => ()
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case sg   => out += sg
      }
      (if (abs) "/" else "") + out.mkString("/") +
        (if (trailingSlash && out.nonEmpty) "/" else if (trailingSlash && abs) "" else "")
    }
    var checked = 0
    for (b <- bases; r <- refs) {
      val got = res(b, r)
      val want =
        try {
          val u = new java.net.URI(b).resolve(new java.net.URI(r))
          if (u.getScheme == null ||
              !Set("http", "https").contains(u.getScheme.toLowerCase)) None
          else {
            val sb = new StringBuilder(u.getScheme).append("://")
              .append(Option(u.getRawAuthority).getOrElse(""))
              .append(refDots(Option(u.getRawPath).getOrElse("")))
            Option(u.getRawQuery).filter(_.nonEmpty).foreach(q => sb.append('?').append(q))
            Some(sb.toString)
          }
        } catch { case _: java.net.URISyntaxException => None }
      if (want.isDefined) {
        val gotDots = got.map { g =>
          val m = "^(https?://[^/?]*)([^?]*)(\\?.*)?$".r
          g match {
            case m(pre, pth, q) => pre + refDots(pth) + Option(q).getOrElse("")
            case _ => g
          }
        }
        assert(gotDots == want, s"base=$b ref=$r: got $got want $want")
        checked += 1
      }
    }
    assert(checked > 400, s"fuzz coverage collapsed: only $checked comparisons ran")
  }

  test("column form runs inside whole-stage codegen (fallback disabled) and null-propagates") {
    val key = "spark.sql.codegen.fallback"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val rows = Seq(
        ("https://a.com/p/q", "../r"),
        ("https://a.com/p/q", "//b.com/s"),
        ("https://a.com/p/q", null.asInstanceOf[String]),
        (null.asInstanceOf[String], "/x"),
        // NULL base must still reach the kernel for an absolute href
        // (the expression is null-tolerant on the base side only)
        (null.asInstanceOf[String], "https://c.org/t"))
        .toDF("url", "href")
        .select(UrlOps.resolveHref(col("url"), col("href")).as("r"))
        .collect().map(r => Option(r.getString(0)))
      assert(rows.toSeq == Seq(
        Some("https://a.com/r"), Some("https://b.com/s"), None, None,
        Some("https://c.org/t")))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
