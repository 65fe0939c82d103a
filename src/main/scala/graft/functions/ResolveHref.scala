package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution against a base URL, as a native
  * Catalyst expression — the pass that turns raw markup hrefs (majority
  * RELATIVE in real pages) into absolute link-graph targets.
  *
  * Scope matches the crawl pipeline it feeds ([[graft.pipeline.LinkGraph]]):
  * an ABSOLUTE http(s) href resolves regardless of the base (RFC 3986
  * §5.2.2 takes absolute references verbatim — a document with
  * mailto/garbage/NULL provenance still contributes its absolute
  * cross-domain edges); every RELATIVE reference class needs an
  * absolute http(s) base to anchor it (NULL otherwise), and the RESULT
  * must be http(s) (an href with any other scheme — mailto:,
  * javascript:, data: — resolves to NULL, the visible drop the link
  * graph documents). Handled reference classes, per RFC 3986 §5.2.2:
  *
  *  - absolute http(s) (`https://h/p`) — taken as-is, dot-segments
  *    removed from its path;
  *  - protocol-relative (`//h/p`) — base scheme + href authority/path;
  *  - absolute-path (`/p`) — base scheme+authority, href path;
  *  - relative-path (`p`, `./p`, `../p`) — merged with the base path
  *    (everything after the last `/`), then dot-segment removal
  *    (§5.2.4; `..` above the root clamps at the root, per the spec's
  *    remove-last-segment on an empty output);
  *  - query-only (`?q`) — base path, href query;
  *  - empty and fragment-only — the base itself (same-document
  *    reference), keeping the base query.
  *
  * Fragments never survive (a crawl target is a document, not an
  * in-page anchor). Components are otherwise passed through VERBATIM —
  * case, ports, userinfo, empty-path spellings are all
  * [[CanonicalUrl]]'s job downstream; resolution is purely mechanical.
  *
  * One static kernel call per row (the [[RegistrableDomain]] discipline:
  * stays inside whole-stage codegen, no HOF lambdas, no literal-array
  * CASE arms to overflow Janino).
  */
object HrefKernel {
  // scheme://authority path [?query] — fragment excluded by the groups
  private val parts: Pattern =
    Pattern.compile("^(?i)(https?)://([^/?#]*)([^?#]*)\\??([^#]*)")

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDots(p: String): String = {
    if (p.isEmpty || (p.indexOf("./") < 0 && !p.endsWith(".") )) return p
    var input = p
    val out = new java.lang.StringBuilder
    def dropLastSeg(): Unit = {
      val cut = out.lastIndexOf("/")
      out.setLength(if (cut < 0) 0 else cut)
    }
    while (input.nonEmpty) {
      if (input.startsWith("../")) input = input.substring(3)
      else if (input.startsWith("./")) input = input.substring(2)
      else if (input.startsWith("/./")) input = "/" + input.substring(3)
      else if (input == "/.") input = "/"
      else if (input.startsWith("/../")) { input = "/" + input.substring(4); dropLastSeg() }
      else if (input == "/..") { input = "/"; dropLastSeg() }
      else if (input == "." || input == "..") input = ""
      else {
        val start = if (input.charAt(0) == '/') 1 else 0
        val next = input.indexOf('/', start)
        if (next < 0) { out.append(input); input = "" }
        else { out.append(input, 0, next); input = input.substring(next) }
      }
    }
    out.toString
  }

  private def build(scheme: String, auth: String, path: String, query: String): UTF8String = {
    val sb = new java.lang.StringBuilder(scheme).append("://").append(auth).append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }

  /** True iff h(0..colon) is a valid URI scheme prefix (ALPHA then
    * ALPHA/DIGIT/+/-/.), so `foo/bar:baz` style relative paths with a
    * colon inside a later segment don't misparse as schemes.
    */
  private def isScheme(h: String, colon: Int): Boolean = {
    if (colon <= 0) return false
    val c0 = h.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < colon) {
      val c = h.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  def resolve(base: UTF8String, href: UTF8String): UTF8String = {
    if (href == null) return null
    var h = href.toString
    val hash = h.indexOf('#')
    if (hash >= 0) h = h.substring(0, hash)

    // scheme'd reference? (the colon must precede any /, ? — a colon
    // inside a path segment is not a scheme separator)
    val colon = h.indexOf(':')
    val firstSlash = h.indexOf('/')
    val firstQ = h.indexOf('?')
    val schemed = colon > 0 &&
      (firstSlash < 0 || colon < firstSlash) &&
      (firstQ < 0 || colon < firstQ) && isScheme(h, colon)
    if (schemed) {
      // RFC 3986 §5.2.2: an absolute reference is taken verbatim WITHOUT
      // consulting the base — a document with garbage/absent provenance
      // still contributes its absolute cross-domain edges (only the
      // non-http(s) schemes drop: mailto:, javascript:, data:)
      val m = parts.matcher(h)
      if (!m.find()) return null
      return build(m.group(1), m.group(2), removeDots(m.group(3)), m.group(4))
    }
    // every other reference class is RELATIVE and needs an absolute
    // http(s) base to anchor it
    if (base == null) return null
    val b = parts.matcher(base.toString)
    if (!b.find()) return null
    val bScheme = b.group(1)
    val bAuth = b.group(2)
    val bPath = b.group(3)
    val bQuery = b.group(4)
    if (h.startsWith("//")) {
      // protocol-relative: authority (and everything after) from the href
      val rest = h.substring(2)
      var cut = rest.length
      var i = 0
      while (i < rest.length && cut == rest.length) {
        val c = rest.charAt(i)
        if (c == '/' || c == '?') cut = i
        i += 1
      }
      val auth = rest.substring(0, cut)
      val tail = rest.substring(cut)
      val qi = tail.indexOf('?')
      val (p, q) = if (qi >= 0) (tail.substring(0, qi), tail.substring(qi + 1)) else (tail, "")
      return build(bScheme, auth, removeDots(p), q)
    }
    if (h.isEmpty) return build(bScheme, bAuth, bPath, bQuery) // same-document
    val qi = h.indexOf('?')
    val (hPath, hQuery) = if (qi >= 0) (h.substring(0, qi), h.substring(qi + 1)) else (h, "")
    if (hPath.isEmpty) {
      // query-only keeps the base path; ?-with-empty-query still replaces
      return build(bScheme, bAuth, bPath, hQuery)
    }
    val merged =
      if (hPath.charAt(0) == '/') hPath
      else {
        // merge (§5.2.3): base path up to and including its last slash;
        // an authority'd base with an empty path merges as root
        val basePath = if (bPath.isEmpty) "/" else bPath
        basePath.substring(0, basePath.lastIndexOf('/') + 1) + hPath
      }
    build(bScheme, bAuth, removeDots(merged), hQuery)
  }
}

case class ResolveHref(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // NOT nullIntolerant on the BASE side: an absolute http(s) href
  // resolves without a base (RFC 3986 §5.2.2), so a NULL/absent
  // provenance URL must reach the kernel as null, not short-circuit the
  // whole row to NULL. A NULL href is always NULL.
  override def prettyName: String = "resolve_href"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val h = right.eval(input)
    if (h == null) null
    else {
      val b = left.eval(input)
      HrefKernel.resolve(
        if (b == null) null else b.asInstanceOf[UTF8String],
        h.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bGen = left.genCode(ctx)
    val hGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${hGen.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${hGen.isNull}) {
        ${bGen.code}
        ${ev.value} = graft.functions.HrefKernel.resolve(
          ${bGen.isNull} ? null : ${bGen.value}, ${hGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ResolveHref {
  def of(base: Column, href: Column): Column =
    GraftSqlBridge.column(ResolveHref(
      GraftSqlBridge.expression(base), GraftSqlBridge.expression(href)))
}
