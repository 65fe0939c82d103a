package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over embedding arrays (SURVEY §2 extensions, ANN /
  * near-dup kernels).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function form:
  * HOFs run interpreted (no codegen, per-element lambda dispatch, a
  * materialized zipped array per row) — measurable overhead when every
  * candidate pair of a similarity join pays it. This expression is a tight
  * primitive loop behind `doGenCode`, so it stays inside whole-stage
  * codegen with zero allocation.
  *
  * Arithmetic parity with the HOF form is exact: elements are widened to
  * double and accumulated strictly left-to-right (same IEEE sequence the
  * fold produced), so existing oracle hashes are unchanged.
  */
object VecDotKernel {
  /** Lengths must be equal (the expression null-guards mismatches).
    * Callers must prove element-null-freedom (`containsNull = false` on
    * both array types) before using this primitive path.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Null-tolerant variant for arrays whose type admits null ELEMENTS: a
    * null element poisons the whole product to NULL, exactly like the
    * `aggregate(zip_with(...))` fold this expression replaced — a
    * malformed embedding must be excluded from similarity results, not
    * score a partial dot product.
    */
  def dotNullable(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // unequal lengths → NULL, matching the HOF form it replaced (zip_with
  // pads the shorter side with null, poisoning the fold to NULL) — a
  // truncated/malformed embedding must stay excluded from similarity
  // results, not score a partial dot product
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val aFloat = isFloat(left)
  private lazy val bFloat = isFloat(right)
  // element-null check is statically elided when both array types prove
  // containsNull = false — the hot path (parquet embeddings read with a
  // tight schema, driver-built literal hyperplanes) keeps the primitive
  // zero-allocation loop
  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }
  private lazy val nullableElems = mayHaveNullElems(left) || mayHaveNullElems(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else if (nullableElems) VecDotKernel.dotNullable(x, y, aFloat, bFloat)
    else VecDotKernel.dot(x, y, aFloat, bFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (nullableElems) s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          java.lang.Double ${ev.value}_r =
            graft.functions.VecDotKernel.dotNullable($a, $b, $aFloat, $bFloat);
          if (${ev.value}_r == null) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = ${ev.value}_r.doubleValue();
          }
        }"""
      else s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.VecDotKernel.dot($a, $b, $aFloat, $bFloat);
        }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def of(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
