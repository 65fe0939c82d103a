package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.PslSnapshot

/** Registrable-domain extraction as a native Catalyst expression.
  *
  * WHY AN EXPRESSION: the pure-Column spelling of the public-suffix-list
  * algorithm (kept as `UrlOps.registrableDomainHof`, the differential
  * reference) inlines the ~300-entry rule arrays into every CASE arm —
  * Catalyst's subexpression elimination skips conditional branches, so
  * the generated projection method exceeds Janino's 64 KB limit,
  * whole-stage codegen FAILS, and Spark re-attempts the ~1 s compile on
  * EVERY execution before falling back to interpreted per-row
  * evaluation (measured: 1.1 s fixed per query at any input size, and
  * the interpreted walk would be the per-row cost at cluster scale).
  * This expression is one tree node whose codegen is a single static
  * call into [[PslKernel]] — hash-set rule lookups, O(labels) per row,
  * and the enclosing stage stays inside whole-stage codegen.
  *
  * Semantics are EXACTLY the Column form's (differential-spec-asserted
  * in UrlOpsSpec): host = regex group 2 of the http(s) URL shape with
  * userinfo skipped, lowercased (UTF8String.toLowerCase — the same
  * kernel Spark's `lower` uses), `:port` suffix stripped; then the PSL
  * walk over [[PslSnapshot]] (longest rule wins, wildcard parents make
  * one-label-longer suffixes, exception rules beat everything, implicit
  * `*` default); NULL for non-http(s) input, host-is-suffix kept as-is.
  */
object PslKernel {
  // the same component regex UrlOps uses (group 2 = host[:port],
  // optional userinfo skipped); compiled once per JVM
  private val parts: Pattern =
    Pattern.compile("^(?i)(https?)://(?:[^/?#@]*@)?([^/?#]*)([^?#]*)\\??([^#]*)")

  private def toSet(m: Map[Int, Seq[String]]): Map[Int, java.util.HashSet[String]] =
    m.map { case (k, rules) =>
      val s = new java.util.HashSet[String](rules.size * 2)
      rules.foreach(s.add)
      (k, s)
    }

  // rule tables as hash sets, grouped by label count (frozen at class
  // load from the PslSnapshot seam — a fuller snapshot swaps in there)
  private val exact: Map[Int, java.util.HashSet[String]] = toSet(PslSnapshot.exactByLen)
  private val wildcard: Map[Int, java.util.HashSet[String]] = toSet(PslSnapshot.wildcardByLen)
  // exceptions checked longest-first (the PSL contract)
  private val exceptionsDesc: Seq[(Int, java.util.HashSet[String])] =
    toSet(PslSnapshot.exceptionsByLen).toSeq.sortBy(-_._1)
  private val maxPub: Int = PslSnapshot.maxSuffixLabels

  /** Last `k` labels of `labels`, joined by '.'. */
  private def sfx(labels: Array[String], k: Int): String = {
    val n = labels.length
    if (k == 1) labels(n - 1)
    else {
      val sb = new java.lang.StringBuilder
      var i = n - k
      while (i < n) {
        if (i > n - k) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }

  /** Registrable domain of an http(s) URL, or null. Called from both the
    * interpreted eval and the generated code (one static call site).
    */
  def domainOf(url: UTF8String): UTF8String = {
    if (url == null) return null
    val m = parts.matcher(url.toString)
    if (!m.find()) return null
    var host = UTF8String.fromString(m.group(2)).toLowerCase.toString
    // strip a trailing :port (the Column form's ":[0-9]+$" replace)
    val colon = host.lastIndexOf(':')
    if (colon >= 0 && colon < host.length - 1) {
      var i = colon + 1
      var allDigits = true
      while (i < host.length && allDigits) {
        if (host.charAt(i) < '0' || host.charAt(i) > '9') allDigits = false
        i += 1
      }
      if (allDigits) host = host.substring(0, colon)
    }
    if (host.isEmpty) return null
    // Spark's split(host, "\\.") keeps empty labels (limit -1)
    val labels = host.split("\\.", -1)
    val n = labels.length

    // exception rules trump everything, longest first
    exceptionsDesc.foreach { case (k, excs) =>
      if (n >= k && excs.contains(sfx(labels, k)))
        return UTF8String.fromString(sfx(labels, k))
    }

    // public-suffix length: longest matching rule, default 1
    var pubLen = 1
    exact.foreach { case (k, rules) =>
      if (k > pubLen && n >= k && rules.contains(sfx(labels, k))) pubLen = k
    }
    wildcard.foreach { case (k, parents) =>
      if (k + 1 > pubLen && n >= k + 1 && parents.contains(sfx(labels, k))) pubLen = k + 1
    }

    // host IS a suffix (or shorter) → kept as-is; else suffix + one label
    if (n <= pubLen) UTF8String.fromString(host)
    else UTF8String.fromString(sfx(labels, math.min(pubLen, maxPub) + 1))
  }
}

case class RegistrableDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "registrable_domain"

  override def nullSafeEval(input: Any): Any =
    PslKernel.domainOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PslKernel.domainOf($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegistrableDomain {
  def of(url: Column): Column =
    GraftSqlBridge.column(RegistrableDomain(GraftSqlBridge.expression(url)))
}
