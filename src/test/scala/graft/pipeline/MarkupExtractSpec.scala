package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-markup contract of [[MarkupExtract]]: tag soup in, main
  * text out, no crashes on hostile input. The classifier's two signals
  * (block length, link density) are exercised at their thresholds.
  */
class MarkupExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): (String, Long, Long) = {
    val r = MarkupExtract.extract(Seq((1L, html)).toDF("doc_id", "html")).head()
    (r.getAs[String]("text"), r.getAs[Long]("n_blocks"), r.getAs[Long]("n_good"))
  }

  test("chrome drops, content survives: nav/footer/script/style/comment vs a real paragraph") {
    val html =
      """<html><head><title>T</title><style>p { color: red; }</style>""" +
        """<script>if (1 < 2) { track("&"); }</script></head><body>""" +
        """<nav><a href="/">Home</a> <a href="/a">About</a></nav>""" +
        """<!-- comment with a fake <p>paragraph</p> inside -->""" +
        """<h1>Short</h1>""" +
        """<p>The quick brown fox jumps over the lazy dog near the river bank.</p>""" +
        """<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer></body></html>"""
    val (txt, _, nGood) = extractOne(html)
    assert(txt == "The quick brown fox jumps over the lazy dog near the river bank.")
    assert(nGood == 1L)
  }

  test("entity decode: supported entities decode; &amp;lt; yields the LITERAL &lt; the author wrote") {
    val html = "<p>He said &quot;rows &amp; columns&quot;, a &#39;q&#39;," +
      " a&nbsp;gap, 1 &lt; 2, and the string &amp;lt; stays escaped here.</p>"
    val (txt, _, _) = extractOne(html)
    assert(txt == "He said \"rows & columns\", a 'q', a gap, 1 < 2," +
      " and the string &lt; stays escaped here.")
  }

  test("inline tags stay in their block; nested block tags segment") {
    val html = "<div>Outer text with <b>bold</b> and <a href='/x'>one link</a> runs long enough" +
      "<div>Inner nested block also runs long enough to be kept as content</div></div>"
    val (txt, nBlocks, nGood) = extractOne(html)
    assert(nBlocks == 2L && nGood == 2L)
    assert(txt == "Outer text with bold and one link runs long enough " +
      "Inner nested block also runs long enough to be kept as content")
  }

  test("truncated markup: unclosed tags and a cut mid-tag never crash, text still extracts") {
    val cases = Seq(
      "<p>A paragraph long enough to keep that never gets its closing tag",
      "<p>Kept paragraph with enough characters here</p><div><a href=\"/x\" cla",
      "<p>Kept paragraph with enough characters here</p><scri",
      "<!-- an unclosed comment swallows the rest <p>gone</p>",
      "")
    val got = cases.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "html")
    val out = MarkupExtract.extract(got).orderBy("doc_id")
      .select("text").as[String].collect()
    assert(out(0) == "A paragraph long enough to keep that never gets its closing tag")
    assert(out(1) == "Kept paragraph with enough characters here")
    assert(out(2).startsWith("Kept paragraph with enough characters here"))
    // an unclosed comment is NOT stripped (the non-greedy needs the
    // terminator) — its tags strip and its text survives as one block;
    // honest-degradation contract, not silent data loss
    assert(out(3).nonEmpty)
    assert(out(4) == "")
  }

  test("link density at the boundary: all-link and mostly-link blocks drop, sub-threshold keeps") {
    // 30 chars of text, 9 link chars = 300000 ppm exactly — kept (<=)
    val atThr = "<div><a href='/x'>linkchars</a> abcdefghij klmnopqrs</div>"
    val (t1, _, g1) = extractOne(atThr)
    assert(g1 == 1L && t1.nonEmpty)
    // same text but majority inside <a> — dropped
    val over = "<div><a href='/x'>most of this block text lives inside the anchor tag</a> tail</div>"
    val (t2, b2, g2) = extractOne(over)
    assert(b2 == 1L && g2 == 0L && t2 == "")
  }

  test("length threshold: a 24-char block drops, a 25-char block keeps") {
    val h24 = "<p>" + "x" * 24 + "</p>"
    val h25 = "<p>" + "y" * 25 + "</p>"
    assert(extractOne(h24)._3 == 0L)
    assert(extractOne(h25)._3 == 1L)
  }

  test("NULL markup reads as empty markup: zero blocks, empty text, zero counts — never a half-NULL row") {
    import spark.implicits._
    val out = MarkupExtract.extract(
        Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "html"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(out(0) == Seq(1L, "", 0L, 0L, 0L))
    assert(out(1) == Seq(2L, "", 0L, 0L, 0L))
  }

  test("corpus roundtrip at sf0.001: wrapped docs extract back to exactly their text") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val wrapped = docs.select(col("doc_id"),
      concat(lit("<html><head><title>D</title></head><body><nav><a href='/'>Home</a>" +
          " <a href='/a'>About</a> <a href='/c'>Contact</a></nav><p>"),
        col("text"),
        lit("</p><footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>" +
          "</body></html>")).as("html"))
    val bad = MarkupExtract.extract(wrapped)
      .join(docs.withColumnRenamed("text", "want"), "doc_id")
      .where(col("text") =!= col("want"))
    assert(bad.isEmpty, "extraction must recover every document's text byte-exactly")
  }

  test("property: extraction == an independent Scala reference on seeded random tag soup") {
    // reference implementation of the documented algorithm, straight-line
    // Scala — validates the HOF/struct plumbing of the Spark expression
    // composition against something with no plumbing at all (the DuckDB
    // oracle separately validates the regex dialect)
    def clean(s: String): String = {
      var t = s.replaceAll(MarkupExtract.inlineTagRe, " ")
      MarkupExtract.entities.foreach { case (e, ch) =>
        t = t.replaceAll(e, java.util.regex.Matcher.quoteReplacement(ch))
      }
      t.replaceAll(MarkupExtract.wsRunRe, " ").trim
    }
    def refExtract(html: String): (String, Long, Long) = {
      val pre = html.replaceAll(MarkupExtract.commentRe, " ")
        .replaceAll(MarkupExtract.scriptRe, " ")
        .replaceAll(MarkupExtract.styleRe, " ")
      val anchor = java.util.regex.Pattern.compile(MarkupExtract.anchorRe)
      val blocks = pre.split(MarkupExtract.blockSplitRe, -1).toSeq
        .map { b =>
          val m = anchor.matcher(b)
          val links = Iterator.continually(m).takeWhile(_.find()).map(_.group(1)).mkString(" ")
          (clean(b), clean(links))
        }
        .filter(_._1.nonEmpty)
      val good = blocks.filter { case (t, l) =>
        t.length >= MarkupExtract.minCharsDefault &&
          l.length * 1000000L <= MarkupExtract.maxLinkPpmDefault * t.length
      }
      (good.map(_._1).mkString(" "), blocks.size.toLong, good.size.toLong)
    }
    val rnd = new scala.util.Random(0x3a9)
    val pieces = Seq("<p>", "</p>", "<div class='x'>", "</div>", "<a href='/y'>", "</a>",
      "<b>", "</b>", "<br/>", "&amp;", "&lt;", "&nbsp;", "&#39;",
      "<script>var x = 1 < 2;</script>", "<style>p{}</style>", "<!-- note <p>x</p> -->",
      "<h2>", "</h2>", "<li>", "</li>")
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf")
    val docs = (1 to 60).map { i =>
      val n = 5 + rnd.nextInt(40)
      var h = (1 to n).map { _ =>
        if (rnd.nextInt(3) == 0) pieces(rnd.nextInt(pieces.size))
        else words(rnd.nextInt(words.size))
      }.mkString(" ")
      if (rnd.nextInt(4) == 0) h = h.substring(0, rnd.nextInt(h.length + 1)) // truncate mid-anything
      (i.toLong, h)
    }
    val got = MarkupExtract.extract(docs.toDF("doc_id", "html")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, h) =>
      assert(got(id) == refExtract(h), s"doc $id diverged on: $h")
    }
  }

  test("extraction is stateless-streaming legal (scan-side projection, no shuffle)") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData((1L, "<p>Streaming ingest extracts markup on the fly just fine</p>"))
    val q = MarkupExtract.extract(
        in.toDF().toDF("doc_id", "html"))
      .writeStream.format("memory").queryName("mx_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("mx_stream").select("text").as[String].collect()
    assert(got.toSeq == Seq("Streaming ingest extracts markup on the fly just fine"))
  }

  test("keep passthrough rejects names that collide with the output schema") {
    val docs = Seq((1L, "<p>x</p>", "t")).toDF("doc_id", "html", "text")
    val e = intercept[IllegalArgumentException](
      MarkupExtract.extract(docs, keep = Seq("text")))
    assert(e.getMessage.contains("keep collides"))
  }
}
