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

  test("non-http(s) or malformed base resolves nothing") {
    assert(res("mailto:x@y.com", "/a").isEmpty)
    assert(res("not a url", "https://ok.com/x").isEmpty)
    assert(res("ftp://h.com/a", "b").isEmpty)
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
        (null.asInstanceOf[String], "/x"))
        .toDF("url", "href")
        .select(UrlOps.resolveHref(col("url"), col("href")).as("r"))
        .collect().map(r => Option(r.getString(0)))
      assert(rows.toSeq == Seq(
        Some("https://a.com/r"), Some("https://b.com/s"), None, None))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
