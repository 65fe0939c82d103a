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

  /** The ppm quantization both engines share: floor(x·1e6) after exact
    * float→double widening. A LONG input array is ALREADY ppm (the
    * trainer/residual path) and passes through; a null element returns
    * null (HOF null-poisoning).
    */
  private def toPpm(vec: ArrayData, kind: Int): Array[Long] = {
    val dim = vec.numElements()
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      out(i) = kind match {
        case 0 => vec.getLong(i)
        case 1 => math.floor(vec.getFloat(i).toDouble * 1000000d).toLong
        case _ => math.floor(vec.getDouble(i) * 1000000d).toLong
      }
      i += 1
    }
    out
  }

  private def dimGuard(dim: Int, m: Int, subDim: Int): Unit =
    if (dim != m * subDim)
      throw new IllegalArgumentException(
        s"PQ: vector dimension $dim != ${m * subDim} — wrong-dimension vectors would silently mis-encode")

  /** PQ ENCODE for one vector: per subspace, the argmin-L2 codebook
    * entry over the ppm components (ties to the LOWER code id — the
    * array_min struct-ordering contract of the HOF spelling). `kind`:
    * 0 = already-ppm longs, 1 = floats, 2 = doubles.
    */
  def codes(vec: ArrayData, kind: Int, cbs: Array[Long], ksub: Int, subDim: Int): ArrayData = {
    val ppm = toPpm(vec, kind)
    if (ppm == null) return null
    val m = cbs.length / (ksub * subDim)
    dimGuard(ppm.length, m, subDim)
    encodePpm(ppm, cbs, ksub, subDim, m)
  }

  private def encodePpm(ppm: Array[Long], cbs: Array[Long], ksub: Int, subDim: Int, m: Int): ArrayData = {
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val vOff = mi * subDim
      var best = Long.MaxValue
      var bestC = 0L
      var ci = 0
      while (ci < ksub) {
        val cbOff = (mi * ksub + ci) * subDim
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = ppm(vOff + j) - cbs(cbOff + j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bestC = ci.toLong }
        ci += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** RESIDUAL PQ encode for one (vector, cell) row: ppm-quantize,
    * subtract the cell centroid's ppm components, then [[codes]]'
    * argmin — the whole IVFPQ encode scan in one kernel call (no HOF
    * subtraction pass, no interpreted argmin). `centPpm` is the flat
    * (cell · dim + i) centroid-ppm table.
    */
  def residualCodes(
      vec: ArrayData, kind: Int, cell: Long,
      centPpm: Array[Long], cbs: Array[Long], ksub: Int, subDim: Int): ArrayData = {
    val ppm = toPpm(vec, kind)
    if (ppm == null) return null
    val m = cbs.length / (ksub * subDim)
    dimGuard(ppm.length, m, subDim)
    val dim = ppm.length
    if (cell < 0L || (cell + 1L) * dim > centPpm.length)
      throw new IllegalArgumentException(
        s"PQ: cell $cell outside the ${centPpm.length / dim}-cell centroid table")
    val cOff = cell.toInt * dim
    var i = 0
    while (i < dim) { ppm(i) -= centPpm(cOff + i); i += 1 }
    encodePpm(ppm, cbs, ksub, subDim, m)
  }

  /** Squared ppm² norm of the IVFPQ RECONSTRUCTION centroid(cell) +
    * codebook(codes) — the per-vector constant L2 ADC stores at encode
    * time. Null codes elements poison to null; out-of-range cells or
    * code ids throw (the ANSI element_at contract).
    */
  def reconNrm2(
      cell: Long, codesArr: ArrayData,
      centPpm: Array[Long], cbs: Array[Long], ksub: Int, subDim: Int): java.lang.Long = {
    val m = codesArr.numElements()
    val dim = m * subDim
    if (cell < 0L || (cell + 1L) * dim > centPpm.length)
      throw new IllegalArgumentException(
        s"PQ: cell $cell outside the ${centPpm.length / dim}-cell centroid table")
    val cOff = cell.toInt * dim
    var acc = 0L
    var mi = 0
    while (mi < m) {
      if (codesArr.isNullAt(mi)) return null
      val c = codesArr.getLong(mi)
      if (c < 0L || c >= ksub)
        throw new IllegalArgumentException(
          s"PQ: code $c outside the $ksub-entry codebook of subspace $mi")
      val cbOff = (mi * ksub + c.toInt) * subDim
      var j = 0
      while (j < subDim) {
        val v = centPpm(cOff + mi * subDim + j) + cbs(cbOff + j)
        acc += v * v
        j += 1
      }
      mi += 1
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
  def lut(vec: ArrayData, kind: Int, cbs: Array[Long], ksub: Int, subDim: Int): ArrayData = {
    val ppm = toPpm(vec, kind)
    if (ppm == null) return null
    val dim = ppm.length
    val m = cbs.length / (ksub * subDim)
    dimGuard(dim, m, subDim)
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

  private lazy val kind = PqInputKind.of(child)

  override def nullSafeEval(vec: Any): Any =
    PqKernel.lut(vec.asInstanceOf[ArrayData], kind, cbsFlat, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbsRef = ctx.addReferenceObj("pqCbsFlat", cbsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.PqKernel.lut($v, $kind, $cbsRef, $ksub, $subDim);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLut {
  def of(vec: Column, cbs: Seq[Seq[Seq[Long]]]): Column = {
    val (flat, ksub, subDim) = PqCodes.flatten(cbs)
    GraftSqlBridge.column(PqLut(GraftSqlBridge.expression(vec), flat, ksub, subDim))
  }
}

/** Input-kind dispatch shared by the encode expressions: 0 = array of
  * already-ppm longs, 1 = floats, 2 = doubles.
  */
private[functions] object PqInputKind {
  def of(e: Expression): Int = e.dataType match {
    case ArrayType(LongType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(DoubleType, _) => 2
    case other => throw new IllegalArgumentException(
      s"PQ encode needs array<bigint|float|double>, got $other")
  }
}

/** `pq_codes(vec)` — the PQ encode argmin with the codebook table
  * embedded at plan time; accepts float/double vectors (ppm-quantized
  * in-kernel) or already-ppm long arrays (the trainer/rotated path). See
  * [[PqKernel.codes]].
  */
case class PqCodes(child: Expression, cbsFlat: Array[Long], ksub: Int, subDim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"

  private lazy val kind = PqInputKind.of(child)

  override def nullSafeEval(vec: Any): Any =
    PqKernel.codes(vec.asInstanceOf[ArrayData], kind, cbsFlat, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbsRef = ctx.addReferenceObj("pqCbsFlat", cbsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.PqKernel.codes($v, $kind, $cbsRef, $ksub, $subDim);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  private[functions] def flatten(cbs: Seq[Seq[Seq[Long]]]): (Array[Long], Int, Int) = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty) && cbs.head.head.nonEmpty,
      "PQ: empty codebook table")
    val ksub = cbs.head.length
    val subDim = cbs.head.head.length
    require(cbs.forall(cb => cb.length == ksub && cb.forall(_.length == subDim)),
      "PQ: ragged codebook table")
    (cbs.flatten.flatten.toArray, ksub, subDim)
  }

  def of(vec: Column, cbs: Seq[Seq[Seq[Long]]]): Column = {
    val (flat, ksub, subDim) = flatten(cbs)
    GraftSqlBridge.column(PqCodes(GraftSqlBridge.expression(vec), flat, ksub, subDim))
  }
}

/** `pq_residual_codes(vec, cell)` — the IVFPQ encode scan in one node:
  * quantize, subtract the cell centroid's ppm, argmin-encode. Centroid
  * and codebook tables embedded. See [[PqKernel.residualCodes]].
  */
case class PqResidualCodes(
    left: Expression, right: Expression,
    centPpmFlat: Array[Long], cbsFlat: Array[Long], ksub: Int, subDim: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_residual_codes"

  private lazy val kind = PqInputKind.of(left)

  override def nullSafeEval(vec: Any, cell: Any): Any =
    PqKernel.residualCodes(vec.asInstanceOf[ArrayData], kind,
      cell.asInstanceOf[Long], centPpmFlat, cbsFlat, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("pqCentPpmFlat", centPpmFlat, "long[]")
    val cbsRef = ctx.addReferenceObj("pqCbsFlat", cbsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
      ${ev.value} = graft.functions.PqKernel.residualCodes(
        $v, $kind, $c, $centRef, $cbsRef, $ksub, $subDim);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqResidualCodes {
  def of(vec: Column, cell: Column, centroidsPpm: Seq[Seq[Long]],
      cbs: Seq[Seq[Seq[Long]]]): Column = {
    val (flat, ksub, subDim) = PqCodes.flatten(cbs)
    require(centroidsPpm.nonEmpty && centroidsPpm.forall(_.length == centroidsPpm.head.length),
      "PQ: ragged centroid table")
    GraftSqlBridge.column(PqResidualCodes(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cell),
      centroidsPpm.flatten.toArray, flat, ksub, subDim))
  }
}

/** `pq_recon_nrm2(cell, codes)` — the reconstruction's squared ppm²
  * norm, tables embedded. See [[PqKernel.reconNrm2]].
  */
case class PqReconNrm2(
    left: Expression, right: Expression,
    centPpmFlat: Array[Long], cbsFlat: Array[Long], ksub: Int, subDim: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_recon_nrm2"

  override def nullSafeEval(cell: Any, codesArr: Any): Any = {
    val r = PqKernel.reconNrm2(cell.asInstanceOf[Long],
      codesArr.asInstanceOf[ArrayData], centPpmFlat, cbsFlat, ksub, subDim)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("pqCentPpmFlat", centPpmFlat, "long[]")
    val cbsRef = ctx.addReferenceObj("pqCbsFlat", cbsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, (c, cs) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.PqKernel.reconNrm2(
        $c, $cs, $centRef, $cbsRef, $ksub, $subDim);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqReconNrm2 {
  def of(cell: Column, codes: Column, centroidsPpm: Seq[Seq[Long]],
      cbs: Seq[Seq[Seq[Long]]]): Column = {
    val (flat, ksub, subDim) = PqCodes.flatten(cbs)
    require(centroidsPpm.nonEmpty && centroidsPpm.forall(_.length == centroidsPpm.head.length),
      "PQ: ragged centroid table")
    GraftSqlBridge.column(PqReconNrm2(
      GraftSqlBridge.expression(cell), GraftSqlBridge.expression(codes),
      centroidsPpm.flatten.toArray, flat, ksub, subDim))
  }
}
