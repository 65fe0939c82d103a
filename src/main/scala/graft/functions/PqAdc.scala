package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native product-quantization kernels — the ADC hot path of the IVFPQ
  * probe family ([[graft.pipeline.Similarity]]), replacing the
  * interpreted higher-order-function forms (`pqLutS`/`pqScoreS`):
  *
  *  - the LUT build is M×KSUB×SUBDIM (8×256×8 = 16,384) integer
  *    multiply-adds PER QUERY ROW — and in the incremental probe
  *    ([[graft.pipeline.Similarity.ivfPqStoreMatches]]) every NEW-BATCH
  *    vector is a query, so the build runs corpus-append-sized, where
  *    nested HOF lambdas (interpreted dispatch + boxed Longs + three
  *    materialized sequence arrays) are the measured residual cost of
  *    ext_semdedup_incr (PLANS.md's named PqAdc upgrade);
  *  - the ADC score is M table lookups PER CANDIDATE PAIR — two HOF
  *    aggregates per pair (the score and the reconstruction norm) in
  *    the interpreted form.
  *
  * Arithmetic parity with the HOF forms is exact (pure Long sums, same
  * order), so oracle hashes are unchanged — spec-asserted
  * differentially (PqExprSpec) and by the unchanged CORRECTNESS gate.
  * The [[VecDot]]/[[RegistrableDomain]] codegen discipline: one static
  * kernel call per row inside whole-stage codegen; the codebook table
  * rides along as a flat primitive array via `addReferenceObj`, never
  * as literal-array CASE arms (the r15 Janino-overflow lesson).
  */
object PqKernel {

  /** ADC lookup sum: Σ_m table(m)(codes(m)) over a 2-level Long table —
    * the asymmetric-distance trick's per-pair cost (M lookups). Works
    * for both the per-query LUT (dot terms) and the codebook self-dot
    * table (reconstruction norms). NULL on a null element (the HOF
    * fold's null-poisoning contract); throws on a code id outside the
    * table (the ANSI element_at contract — malformed codes must fail,
    * not mis-score).
    */
  def adc(table: ArrayData, codes: ArrayData): java.lang.Long = {
    val m = table.numElements()
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: ${codes.numElements()} codes against an $m-subspace table")
    var acc = 0L
    var i = 0
    while (i < m) {
      if (table.isNullAt(i) || codes.isNullAt(i)) return null
      val row = table.getArray(i)
      val c = codes.getLong(i)
      if (c < 0L || c >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $c outside the ${row.numElements()}-entry codebook of subspace $i")
      if (row.isNullAt(c.toInt)) return null
      acc += row.getLong(c.toInt)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** ADC LUT build for one query vector: ppm-quantize (floor(x·1e6),
    * the int8/pq convention — exact float→double widening) and fold
    * each subvector against every codebook entry. `cbs` is the flat
    * codebook table (m·KSUB·SUBDIM + c·SUBDIM + i), `ksub` entries per
    * subspace, `subDim` components per entry. Wrong-dimension vectors
    * THROW (the pqDimGuardS contract — silence would mis-encode);
    * a null element yields a NULL LUT (HOF null-poisoning).
    */
  def lut(vec: ArrayData, isFloat: Boolean, cbs: Array[Long], ksub: Int, subDim: Int): ArrayData = {
    val dim = vec.numElements()
    val m = cbs.length / (ksub * subDim)
    if (dim != m * subDim)
      throw new IllegalArgumentException(
        s"PQ: vector dimension $dim != ${m * subDim} — wrong-dimension vectors would silently mis-encode")
    val ppm = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      ppm(i) = math.floor(x * 1000000d).toLong
      i += 1
    }
    val rows = new Array[ArrayData](m)
    var mi = 0
    while (mi < m) {
      val row = new Array[Long](ksub)
      val vOff = mi * subDim
      var ci = 0
      while (ci < ksub) {
        val cbOff = (mi * ksub + ci) * subDim
        var acc = 0L
        var j = 0
        while (j < subDim) { acc += ppm(vOff + j) * cbs(cbOff + j); j += 1 }
        row(ci) = acc
        ci += 1
      }
      rows(mi) = new GenericArrayData(row)
      mi += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

/** `pq_adc(table, codes)` — see [[PqKernel.adc]]. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(table: Any, codes: Any): Any = {
    val r = PqKernel.adc(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.PqKernel.adc($t, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def of(table: Column, codes: Column): Column =
    GraftSqlBridge.column(PqAdc(
      GraftSqlBridge.expression(table), GraftSqlBridge.expression(codes)))
}

/** `pq_lut(vec)` with the codebook table embedded at plan time — see
  * [[PqKernel.lut]]. `cbsFlat` is the flattened (m, c, i) table;
  * embedded as a reference object in generated code (never inlined as
  * array literals — the Janino 64 KB lesson).
  */
case class PqLut(child: Expression, cbsFlat: Array[Long], ksub: Int, subDim: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_lut needs array<float|double>, got $other")
  }

  override def nullSafeEval(vec: Any): Any =
    PqKernel.lut(vec.asInstanceOf[ArrayData], isFloat, cbsFlat, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbsRef = ctx.addReferenceObj("pqCbsFlat", cbsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.PqKernel.lut($v, $isFloat, $cbsRef, $ksub, $subDim);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLut {
  def of(vec: Column, cbs: Seq[Seq[Seq[Long]]]): Column = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty) && cbs.head.head.nonEmpty,
      "pq_lut: empty codebook table")
    val ksub = cbs.head.length
    val subDim = cbs.head.head.length
    require(cbs.forall(cb => cb.length == ksub && cb.forall(_.length == subDim)),
      "pq_lut: ragged codebook table")
    GraftSqlBridge.column(PqLut(
      GraftSqlBridge.expression(vec),
      cbs.flatten.flatten.toArray, ksub, subDim))
  }
}
