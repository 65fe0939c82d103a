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
  */
object RobotsMatchKernel {
  /** Classic two-pointer wildcard match of `p` (with `*`) against ALL
    * of `s` — linear with backtracking to the last star.
    */
  private def wildcardFull(s: String, p: String): Boolean = {
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (i < s.length) {
      if (j < p.length && p.charAt(j) != '*' && p.charAt(j) == s.charAt(i)) {
        i += 1; j += 1
      } else if (j < p.length && p.charAt(j) == '*') {
        star = j; mark = i; j += 1
      } else if (star != -1) {
        j = star + 1; mark += 1; i = mark
      } else return false
    }
    while (j < p.length && p.charAt(j) == '*') j += 1
    j == p.length
  }

  /** True iff robots rule `pattern` matches request target `path`. */
  def matches(path: UTF8String, pattern: UTF8String): Boolean = {
    val p = pattern.toString
    val s = path.toString
    if (p.nonEmpty && p.charAt(p.length - 1) == '$')
      wildcardFull(s, p.substring(0, p.length - 1))
    else wildcardFull(s, p + "*")
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
