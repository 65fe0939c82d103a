package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Trained-rotation application — `floor(R · x)` over a frozen
  * integer-ppm matrix: the serving half of the train-once-serve-online
  * PCA rotation ([[graft.pipeline.Rotation]]), which re-expresses an
  * embedding in the trained principal basis so PREFIX TRUNCATION keeps
  * the high-variance coordinates (the dimension-ladder prerequisite
  * ext_knn_dim_recall measures).
  *
  * Cross-engine exactness contract (the int8/PQ ppm discipline):
  * components accumulate `R_ppm(j)(i) · x_i` in double, strictly
  * ascending `i` (the same IEEE sequence the DuckDB twin's `list_sum`
  * over an ascending `list_transform` produces), and `floor` — not
  * `round`, whose half-way convention differs between engines — maps
  * the sum to an exact integer representable in double (|R| ≤ ~2·10^6
  * ppm, |x| small ⇒ sums ≪ 2^53). Downstream cosine over these exact
  * integers is engine-identical.
  *
  * The matrix rides along as a flat primitive array via
  * `addReferenceObj`, never as literal-array CASE arms (the r15
  * Janino-overflow lesson); one static kernel call per row inside
  * whole-stage codegen (the [[VecDot]] discipline).
  */
object MatVecKernel {
  /** `out_j = floor(Σ_i rot(j·dim + i) · x_i)` as exact-integer doubles;
    * NULL on a null element or a vector whose length ≠ `dim` (the
    * [[VecDotKernel]] poisoning contract — a malformed embedding must
    * drop out of similarity results, not half-rotate).
    */
  def matVecFloor(vec: ArrayData, isFloat: Boolean, rot: Array[Long], dim: Int): ArrayData = {
    if (vec.numElements() != dim) return null
    val nOut = rot.length / dim
    val out = new Array[Double](nOut)
    var j = 0
    while (j < nOut) {
      var acc = 0.0
      val off = j * dim
      var i = 0
      while (i < dim) {
        if (vec.isNullAt(i)) return null
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += rot(off + i).toDouble * x
        i += 1
      }
      out(j) = math.floor(acc)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `mat_vec_floor(vec)` with an embedded ppm matrix — see
  * [[MatVecKernel]]. NULL in, NULL out.
  */
case class MatVecFloor(child: Expression, rotFlat: Array[Long], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mat_vec_floor"

  // the KmvDistinct checkInputDataTypes discipline: anything but
  // array<float>/array<double> (array<bigint>, ...) would read raw bits
  // through getDouble and produce silent garbage — refuse at ANALYSIS
  // time, before any task launches
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec_floor: unsupported input type $other (need array<float> or array<double>)")
    }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false // only reachable post-analysis: double
  }

  override def nullSafeEval(vec: Any): Any =
    MatVecKernel.matVecFloor(vec.asInstanceOf[ArrayData], isFloat, rotFlat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rotRef = ctx.addReferenceObj("rotFlat", rotFlat, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.MatVecKernel.matVecFloor($v, $isFloat, $rotRef, $dim);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecFloor {
  def of(vec: Column, rows: Seq[Seq[Long]]): Column = {
    require(rows.nonEmpty && rows.head.nonEmpty, "mat_vec_floor: empty matrix")
    val dim = rows.head.length
    require(rows.forall(_.length == dim), "mat_vec_floor: ragged matrix")
    GraftSqlBridge.column(
      MatVecFloor(GraftSqlBridge.expression(vec), rows.flatten.toArray, dim))
  }
}
