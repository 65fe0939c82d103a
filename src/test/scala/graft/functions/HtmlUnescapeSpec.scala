package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlUnescapeSpec extends SparkSpec {
  import spark.implicits._

  private def un(s: String): String =
    HtmlUnescapeKernel.unescape(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("the five XML named references decode; unknown/legacy forms pass through verbatim") {
    assert(un("a&amp;b") == "a&b")
    assert(un("&lt;x&gt;") == "<x>")
    assert(un("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    // unknown names, case variants, and semicolon-less forms are NOT
    // decoded (raw & dominates real markup; guessing corrupts queries)
    assert(un("&copy;") == "&copy;")
    assert(un("&AMP;") == "&AMP;")
    assert(un("&amp x") == "&amp x")
    assert(un("a & b") == "a & b")
    assert(un("x&") == "x&")
    assert(un("100&&200") == "100&&200")
  }

  test("numeric references: decimal, hex, case-insensitive hex digits, range guards") {
    assert(un("&#47;") == "/")
    assert(un("&#x2F;") == "/")
    assert(un("&#X2f;") == "/")
    assert(un("a&#38;b") == "a&b")
    assert(un("&#233;") == "é")
    assert(un("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // leading zeros are fine within the digit bound
    assert(un("&#x0010FFFF;") == new String(Character.toChars(0x10FFFF)))
    // out of range, surrogates, zero, empty, unterminated: verbatim
    assert(un("&#x110000;") == "&#x110000;")
    assert(un("&#xD800;") == "&#xD800;")
    assert(un("&#0;") == "&#0;")
    assert(un("&#;") == "&#;")
    assert(un("&#x;") == "&#x;")
    assert(un("&#12") == "&#12")
    assert(un("&#999999999999;") == "&#999999999999;")
    // leading zeros beyond the significant-digit bound are valid spellings
    assert(un("&#000000047;") == "/")
    assert(un("&#x00000000002F;") == "/")
    assert(un("&#0000;") == "&#0000;") // all zeros = codepoint 0, out of range
  }

  test("single pass, no rescan: &amp;lt; is the author's literal &lt;") {
    assert(un("&amp;lt;") == "&lt;")
    assert(un("&amp;amp;") == "&amp;")
    assert(un("a=1&amp;b=&#50;&amp;c=3") == "a=1&b=2&c=3")
  }

  test("entity-free input returns the SAME string (zero-copy fast path)") {
    val in = org.apache.spark.unsafe.types.UTF8String.fromString(
      "https://h.com/p?a=1%26b=2#frag")
    assert(HtmlUnescapeKernel.unescape(in) eq in)
  }

  test("column form runs inside whole-stage codegen (fallback disabled), null-propagates, decoded == raw on entity-free corpus") {
    val key = "spark.sql.codegen.fallback"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val got = Seq("a&amp;b", "/local&#47;3", "plain", null)
        .toDF("s")
        .select(HtmlUnescape.of(col("s")).as("d"))
        .collect().map(r => Option(r.getString(0)))
      assert(got.toSeq == Seq(Some("a&b"), Some("/local/3"), Some("plain"), None))
      // decoded == raw for entity-free input, corpus-shaped
      val free = (0 until 500).map(i => s"https://site$i.com/p/$i?a=$i&b=2")
      val pairs = free.toDF("s")
        .select(col("s"), HtmlUnescape.of(col("s")).as("d"))
        .collect()
      assert(pairs.forall(r => r.getString(0) == r.getString(1)))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("property: round-trips a reference encoder over random URL-shaped strings") {
    val rnd = new scala.util.Random(17)
    val chars = "abz09/?=&<>\"' é€"
    def raw(): String = (1 to 1 + rnd.nextInt(20)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    def enc(s: String): String = s.flatMap {
      case '&' => if (rnd.nextBoolean()) "&amp;" else if (rnd.nextBoolean()) "&#38;" else "&#x26;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => if (rnd.nextBoolean()) "&apos;" else "&#39;"
      case c if rnd.nextInt(8) == 0 =>
        if (rnd.nextBoolean()) s"&#${c.toInt};" else s"&#x${c.toInt.toHexString};"
      case c => c.toString
    }
    (1 to 300).foreach { _ =>
      val s = raw()
      assert(un(enc(s)) == s, s"round-trip failed for '$s' via '${enc(s)}'")
    }
  }
}
