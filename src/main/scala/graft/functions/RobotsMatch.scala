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
  * Scope note: matching is octet equality over PRE-NORMALIZED inputs.
  * RFC 9309 §2.2.2 asks that percent-encoded octets compare DECODED
  * (except `%2F`); this matcher does not decode — both sides flow
  * through [[RobotsPctNormKernel]] first (rules at parse time in
  * [[graft.pipeline.Robots.parseGroups]], targets scan-side via
  * [[RobotsPctNorm]] in the decision projections), so divergent
  * percent-spellings of one octet sequence meet in the shared decoded
  * space before this kernel runs.
  */
object RobotsMatchKernel {
  private final val STAR: Byte = '*'
  private final val DOLLAR: Byte = '$'

  /** Literal-special markers in STORED rule patterns: a rule's `%2A` /
    * `%24` escape means the literal `*` / `$` OCTET, not the pattern
    * special — [[RobotsPctNormKernel.normalizeRule]] decodes them to
    * these private bytes so the matcher can treat them as literals
    * while raw `*`/`$` keep their pattern meaning. The markers are
    * UNREACHABLE from any input, unconditionally: `%01`/`%02` escapes
    * stay ENCODED on both sides (the `%2F` discipline — they still
    * meet byte-equal), and a RAW 0x01/0x02 control byte in a rule
    * line never survives parse — [[graft.pipeline.Robots.parseGroups]]
    * drops rule values carrying raw C0 controls as malformed (RFC
    * 9309's path-pattern grammar excludes CTL), so the only producer
    * of these bytes in a stored pattern is the normalizer's own
    * `%2A`/`%24` decode.
    */
  final val LiteralStar: Byte = 0x01
  final val LiteralDollar: Byte = 0x02

  /** Literal octet equality with the marker mapping: a stored
    * [[LiteralStar]]/[[LiteralDollar]] matches exactly the raw `*`/`$`
    * target octet.
    */
  @inline private def litEq(pb: Byte, sb: Byte): Boolean =
    if (pb == LiteralStar) sb == STAR
    else if (pb == LiteralDollar) sb == DOLLAR
    else pb == sb

  /** Classic two-pointer wildcard match of `p[0, pLen)` (with `*`)
    * against ALL of `s` — greedy with backtracking to the last star:
    * linear on wildcard-free and single-star patterns, but
    * O(|s| · |p|) WORST CASE on adversarial multi-star patterns
    * (a rule of repeated `*a`). robots.txt is adversary-controlled input evaluated
    * per (target × rule) on the decision hot path, so per-row work is
    * bounded upstream: [[graft.pipeline.Robots.parseGroups]] drops
    * rule values longer than its documented cap at parse time (the
    * Google-parser discipline of bounding rule length), which bounds
    * |p| and with it the quadratic term. Byte-level over the raw UTF-8
    * (matching is octet equality per RFC 9309, and the two specials
    * are ASCII, so no decode is needed): zero allocation.
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
      if (j < vLen && pat(j) != STAR && litEq(pat(j), s.getByte(i))) {
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

/** RFC 9309 §2.2.2 percent-encoding normalization — the shared
  * comparison space for rule patterns and request targets: the RFC asks
  * that percent-encoded octets compare DECODED, except `%2F` (an
  * encoded slash is NOT the path separator and must stay distinct).
  * Both sides of the robots decision flow through this ONE kernel —
  * rules at parse time ([[graft.pipeline.Robots.parseGroups]], the
  * rule mode), targets scan-side ([[RobotsPctNorm]], the target mode) —
  * so a rule spelled `/caf%C3%A9` matches a raw-UTF-8 crawl of the
  * same path and vice versa.
  *
  *  - `%2F` is KEPT on BOTH sides, canonicalized to uppercase hex
  *    (`%2f` → `%2F`), so divergent spellings of the kept escape still
  *    meet;
  *  - `%2A` and `%24` decode EXACTLY, mode-split: a request target has
  *    no pattern specials, so the target mode decodes them to the raw
  *    `*`/`$` octets; the RULE mode must not mint specials out of
  *    literal octets, so it decodes them to the matcher's private
  *    literal markers ([[RobotsMatchKernel.LiteralStar]]/
  *    [[RobotsMatchKernel.LiteralDollar]]) — a rule's `%2A` now
  *    matches a target's raw `*` (RFC-exact; the r18 conservative
  *    keep-encoded divergence is closed), raw `*`/`$` in rules keep
  *    their pattern meaning, and the stored literal is ONE octet so
  *    most-octets precedence counts it exactly;
  *  - every other valid `%HH` decodes to its raw octet (matching is
  *    octet equality — the decoded bytes need not be valid UTF-8);
  *  - a malformed escape (`%` not followed by two hex digits) passes
  *    through verbatim.
  *
  * Percent-free input (the overwhelming majority) returns the input
  * as-is after one byte scan — the [[HtmlUnescapeKernel]] zero-copy
  * fast-path discipline.
  */
object RobotsPctNormKernel {
  private final val PCT: Byte = '%'

  @inline private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  private def normalizeImpl(s: UTF8String, ruleSide: Boolean): UTF8String = {
    val n = s.numBytes
    var i = 0
    var hasPct = false
    while (i < n && !hasPct) { if (s.getByte(i) == PCT) hasPct = true; i += 1 }
    if (!hasPct) return s
    val out = new Array[Byte](n)
    var o = 0
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == PCT && i + 2 < n && hexVal(s.getByte(i + 1)) >= 0 &&
          hexVal(s.getByte(i + 2)) >= 0) {
        val v = hexVal(s.getByte(i + 1)) * 16 + hexVal(s.getByte(i + 2))
        // %01/%02 stay encoded on BOTH sides: decoding them would make
        // the literal markers reachable from target input (and a rule's
        // %01 would silently become a literal-star matcher — an
        // under-match); kept-encoded they still meet byte-equal, the
        // %2F discipline
        if (v == '/' || v == RobotsMatchKernel.LiteralStar ||
            v == RobotsMatchKernel.LiteralDollar) {
          out(o) = PCT
          out(o + 1) = java.lang.Character.toUpperCase(s.getByte(i + 1).toChar).toByte
          out(o + 2) = java.lang.Character.toUpperCase(s.getByte(i + 2).toChar).toByte
          o += 3
        } else if (ruleSide && v == '*') { out(o) = RobotsMatchKernel.LiteralStar; o += 1 }
        else if (ruleSide && v == '$') { out(o) = RobotsMatchKernel.LiteralDollar; o += 1 }
        else { out(o) = v.toByte; o += 1 }
        i += 3
      } else { out(o) = b; o += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Target mode (scan-side): decode everything but `%2F`. */
  def normalize(s: UTF8String): UTF8String = normalizeImpl(s, ruleSide = false)

  /** Rule mode (parse time): `%2A`/`%24` become the matcher's literal
    * markers instead of raw specials; everything else as target mode.
    */
  def normalizeRule(s: String): String =
    normalizeImpl(UTF8String.fromString(s), ruleSide = true).toString
}

/** Native `robots_pct_normalize(string)` Catalyst expression — the
  * target-side face of [[RobotsPctNormKernel]]. NULL in, NULL out.
  */
case class RobotsPctNorm(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_pct_normalize"

  override def nullSafeEval(s: Any): Any =
    RobotsPctNormKernel.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RobotsPctNormKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsPctNorm {
  def of(c: Column): Column =
    GraftSqlBridge.column(RobotsPctNorm(GraftSqlBridge.expression(c)))
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
