package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup boilerplate extraction — the FIRST stage of a real web
  * corpus pipeline: raw markup in, main text out. Every operator in this
  * package starts at clean `text`; a CommonCrawl-shaped corpus starts at
  * HTML, and feeding markup to dedup/quality/tokenization poisons all of
  * them (boilerplate nav/footer repeats across a site make every page a
  * near-dup; tag soup inflates token counts; entity escapes split
  * shingles).
  *
  * Pipeline (jusText-style, reduced to its two strongest discriminators
  * so both engines compute it exactly — Pomikálek 2011 uses block length
  * + link density + stopword density; length and link density carry the
  * classifier, and stopword density is already available downstream via
  * `TextAnalysis` quality scoring on the EXTRACTED text):
  *
  *  1. strip comments, `<script>`, `<style>` wholesale (their content is
  *     never prose; a raw `<` inside script text would otherwise corrupt
  *     the block split),
  *  2. segment into BLOCKS on block-level tag boundaries (`<p>`, `<div>`,
  *     headings, lists, tables, `<nav>`, `<footer>`, …) — inline tags
  *     (`<a>`, `<b>`, `<span>`) stay inside their block,
  *  3. per block: strip inline tags, decode the HTML entities that
  *     survive text extraction (`&lt; &gt; &quot; &#39; &nbsp; &amp;` —
  *     `&amp;` LAST, so `&amp;lt;` decodes to the literal `&lt;` the
  *     author wrote, not `<`), collapse whitespace runs, trim,
  *  4. classify: a block is CONTENT iff its text is at least `minChars`
  *     long AND its link density (chars inside `<a>` ÷ all chars, in ppm)
  *     is at most `maxLinkPpm` — navigation, link farms, tag clouds and
  *     footers are mostly links; headings and button labels are short,
  *  5. the document's text is the content blocks joined in order.
  *
  * Scale shape: scan-side only — regex + higher-order functions over one
  * row at a time, no shuffle, no join, no state. The pass fuses into any
  * ingest scan, is legal in a stateless streaming projection as-is, and
  * composes directly with [[TextAnalysis.normalizeDocs]] → exact dedup
  * (extract → NFC-normalize → md5 is the canonical web-ingest chain).
  * Column-API regexes (no SQL-literal escaping layer); the DuckDB twin
  * is generated from the SAME pattern constants below so the engines
  * cannot drift. Patterns avoid backreferences and `\s` (Java and RE2
  * disagree on both); attribute values containing a raw `>` mis-split a
  * block (documented non-goal — a full HTML5 tokenizer is a parser, not
  * a regex; jusText and trafilatura accept the same approximation).
  *
  * Reference analog: the wire→parse→normalize ingest discipline of
  * borsa-yfinance/src/adapter.rs:21-74 (JSON payload → typed frame),
  * re-expressed for the markup face of a corpus pipeline.
  */
object MarkupExtract {
  val minCharsDefault: Long = 25L
  val maxLinkPpmDefault: Long = 300000L

  /** Block-level tag boundary (open or close, any attributes). */
  val blockSplitRe: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|section|article" +
      "|header|footer|nav|aside|blockquote|title|head|body|html|pre|form)\\b[^>]*>"
  val commentRe: String = "(?s)<!--.*?-->"
  val scriptRe: String = "(?is)<script\\b[^>]*>.*?</script>"
  val styleRe: String = "(?is)<style\\b[^>]*>.*?</style>"
  val anchorRe: String = "(?is)<a\\b[^>]*>(.*?)</a>"
  val inlineTagRe: String = "(?s)<[^>]*>"
  val wsRunRe: String = "[ \\t\\n\\r]+"

  /** Entity decode table, in application order (`&amp;` last — see
    * scaladoc). The single quote is dialect-split at the twin site.
    */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  private def deEnt(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }

  /** tag strip → entity decode → whitespace collapse → trim. */
  private def cleanCol(c: Column): Column =
    trim(regexp_replace(deEnt(regexp_replace(c, inlineTagRe, " ")), wsRunRe, " "))

  /** Extract main text per document: (idCol, [keep...], text, n_blocks,
    * n_good, n_chars) — `text` is the content blocks joined, `n_blocks`
    * counts non-empty text blocks, `n_good` the blocks classified as
    * content. `keep` names input columns carried through unchanged
    * (provenance/arrival columns a streaming ingest chain needs
    * downstream — extraction is one projection, so passthrough is free).
    */
  def extract(
      docs: DataFrame,
      htmlCol: String = "html",
      idCol: String = "doc_id",
      minChars: Long = minCharsDefault,
      maxLinkPpm: Long = maxLinkPpmDefault,
      keep: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("text", "n_blocks", "n_good", "n_chars", idCol, "__bs", "__gs")
      .filter(keep.contains)
    require(reserved.isEmpty,
      s"extract: keep collides with output/internal names (rename them): " +
        reserved.mkString(", "))
    // NULL markup reads as EMPTY markup (zero blocks, empty text, zero
    // counts) — without the coalesce the counts would be NULL while the
    // text reads '', an inconsistent row a data card would trip over
    val pre = regexp_replace(
      regexp_replace(regexp_replace(coalesce(col(htmlCol), lit("")), commentRe, " "),
        scriptRe, " "),
      styleRe, " ")
    val blocks = filter(
      transform(split(pre, blockSplitRe), b =>
        struct(
          cleanCol(b).as("txt"),
          cleanCol(concat_ws(" ", regexp_extract_all(b, lit(anchorRe), lit(1))))
            .as("ltxt"))),
      x => x("txt") =!= "")
    // stepwise projections: CollapseProject keeps non-cheap HOF chains in
    // their own Project, so __bs/__gs each evaluate once
    val lead = col(idCol) +: keep.map(col)
    docs.select(lead :+ blocks.as("__bs"): _*)
      .select(lead ++ Seq(col("__bs"),
        filter(col("__bs"), x =>
          length(x("txt")) >= minChars &&
            length(x("ltxt")) * lit(1000000L) <= lit(maxLinkPpm) * length(x("txt")))
          .as("__gs")): _*)
      .select(lead ++ Seq(
        concat_ws(" ", transform(col("__gs"), x => x("txt"))).as("text"),
        size(col("__bs")).cast("long").as("n_blocks"),
        size(col("__gs")).cast("long").as("n_good")): _*)
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // ---------------------------------------------------------------------
  // DuckDB twin (generated from the SAME constants above)
  // ---------------------------------------------------------------------

  private[pipeline] def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def deEntD(x: String): String =
    entities.foldLeft(x) { case (acc, (e, ch)) =>
      s"replace($acc, ${sqlLit(e)}, ${sqlLit(ch)})"
    }

  private def cleanD(x: String): String =
    s"trim(regexp_replace(${deEntD(s"regexp_replace($x, ${sqlLit(inlineTagRe)}, ' ', 'g')")}, " +
      s"${sqlLit(wsRunRe)}, ' ', 'g'))"

  /** DuckDB extraction over a CTE exposing (doc_id, html) as `h`:
    * CTE chain string ending in `ex` with (doc_id, txt, n_blocks, n_good,
    * n_chars). Paste after a `h AS (...)` markup-building CTE.
    */
  def extractSqlD(minChars: Long = minCharsDefault,
      maxLinkPpm: Long = maxLinkPpmDefault): String =
    s"""pre AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
       |    coalesce(html, ''),
       |    ${sqlLit(commentRe)}, ' ', 'g'), ${sqlLit(scriptRe)}, ' ', 'g'),
       |    ${sqlLit(styleRe)}, ' ', 'g') AS ph FROM h),
       |bl AS (SELECT doc_id, list_filter(list_transform(
       |    regexp_split_to_array(ph, ${sqlLit(blockSplitRe)}),
       |    b -> {'txt': ${cleanD("b")},
       |          'ltxt': ${cleanD(s"coalesce(array_to_string(regexp_extract_all(b, ${sqlLit(anchorRe)}, 1), ' '), '')")}}),
       |    x -> x.txt <> '') AS bs FROM pre),
       |gd AS (SELECT doc_id, bs, list_filter(bs, x ->
       |    length(x.txt) >= $minChars AND
       |    length(x.ltxt) * 1000000 <= $maxLinkPpm * length(x.txt)) AS gs FROM bl),
       |ex AS (SELECT doc_id, array_to_string(list_transform(gs, x -> x.txt), ' ') AS txt,
       |    CAST(len(bs) AS BIGINT) AS n_blocks, CAST(len(gs) AS BIGINT) AS n_good,
       |    CAST(length(array_to_string(list_transform(gs, x -> x.txt), ' ')) AS BIGINT) AS n_chars
       |    FROM gd)""".stripMargin
}
