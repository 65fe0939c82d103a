package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 §2.2.3 rule-path matching: a robots rule path is a PREFIX
  * pattern over the request target, with two specials — `*` matches any
  * (possibly empty) octet sequence, and a TRAILING `$` anchors the
  * pattern at the end of the target. Everything else (including a
  * non-trailing `$`) is literal.
  *
  * The whole surface reduces to ONE full-string wildcard match:
  * an unanchored pattern `P` matches iff `P*` matches the ENTIRE
  * target (prefix semantics = free tail), and `P$` matches iff `P`
  * matches the entire target. A pattern without specials therefore
  * degrades to exactly the `startswith` the prefix-only matcher used —
  * byte-identical decisions on wildcard-free rules.
  *
  * Scope note: matching is RAW-octet equality. RFC 9309 §2.2.2 also
  * asks that percent-encoded octets compare DECODED (except `%2F`);
  * this matcher deliberately does not decode — both sides of this
  * pipeline's comparisons flow through [[graft.pipeline.UrlOps]]'
  * canonicalization, which preserves percent-encodings as-is, so rule
  * and target meet in one consistent (undecoded) space. A rule
  * percent-encoded differently from the crawl's URL spelling would
  * need a normalization pass on the RULES table — a documented
  * approximation, not a silent one.
  */
object RobotsMatchKernel {
  private final val STAR: Byte = '*'
  private final val DOLLAR: Byte = '$'

  /** Classic two-pointer wildcard match of `p[0, pLen)` (with `*`)
    * against ALL of `s` — linear with backtracking to the last star.
    * Byte-level over the raw UTF-8 (matching is octet equality per
    * RFC 9309, and the two specials are ASCII, so no decode is
    * needed): zero allocation on the per-(target × rule) hot path.
    * `trailingStar` appends a virtual `*` (the unanchored-prefix
    * reduction) without building a new pattern.
    */
  private def wildcardFull(
      s: UTF8String, p: UTF8String, pLen: Int, trailingStar: Boolean): Boolean = {
    val sLen = s.numBytes
    val vLen = if (trailingStar) pLen + 1 else pLen
    @inline def pat(j: Int): Byte = if (j < pLen) p.getByte(j) else STAR
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (i < sLen) {
      if (j < vLen && pat(j) != STAR && pat(j) == s.getByte(i)) {
        i += 1; j += 1
      } else if (j < vLen && pat(j) == STAR) {
        star = j; mark = i; j += 1
      } else if (star != -1) {
        j = star + 1; mark += 1; i = mark
      } else return false
    }
    while (j < vLen && pat(j) == STAR) j += 1
    j == vLen
  }

  /** True iff robots rule `pattern` matches request target `path`. */
  def matches(path: UTF8String, pattern: UTF8String): Boolean = {
    val n = pattern.numBytes
    if (n > 0 && pattern.getByte(n - 1) == DOLLAR)
      wildcardFull(path, pattern, n - 1, trailingStar = false)
    else wildcardFull(path, pattern, n, trailingStar = true)
  }
}

/** `robots_match(path, pattern)` as a codegen'd expression (the
  * [[ResolveHref]] discipline: one static-kernel call, stays inside
  * whole-stage codegen; composes inside higher-order-function lambdas
  * via the Column DSL).
  */
case class RobotsMatch(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_match"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s == null || p == null) null
    else RobotsMatchKernel.matches(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) =>
      s"${ev.value} = graft.functions.RobotsMatchKernel.matches($s, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsMatch {
  def of(path: Column, pattern: Column): Column =
    GraftSqlBridge.column(RobotsMatch(
      GraftSqlBridge.expression(path), GraftSqlBridge.expression(pattern)))
}
