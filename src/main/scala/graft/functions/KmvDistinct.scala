package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values DISTINCT-COUNT state: the `k` smallest DISTINCT
  * 60-bit hashes seen so far, sorted ascending — fixed-width (≤ k
  * longs), map-side combinable (merge = min-union + truncate), and
  * integer-exact, so the estimate is deterministic and cross-engine
  * reproducible where HyperLogLog's float harmonic mean would drift
  * (the [[graft.pipeline.LinkGraph.harmonicPpmSketch]] argument,
  * applied to the count-distinct axis).
  */
final class KmvState(val k: Int) {
  val arr = new Array[Long](k)
  var n = 0

  /** Insert hash `h` if it is among the k smallest distinct values. */
  def add(h: Long): Unit = {
    if (n == k && h >= arr(n - 1)) return
    var idx = java.util.Arrays.binarySearch(arr, 0, n, h)
    if (idx >= 0) return // already present
    idx = -idx - 1
    val last = math.min(n, k - 1)
    System.arraycopy(arr, idx, arr, idx + 1, last - idx)
    arr(idx) = h
    if (n < k) n += 1
  }

  def mergeIn(o: KmvState): Unit = {
    var i = 0
    while (i < o.n) { add(o.arr(i)); i += 1 }
  }
}

/** KMV distinct-count AGGREGATE — the scale path past exact
  * `count(DISTINCT x)`: exact distinct shuffles every distinct value
  * to its group's reducer (at 100 TB, a second corpus); this carries
  * ≤ `k` longs of state per group per partition, partials merge
  * map-side like any algebraic aggregate, and the reducer sees one
  * fixed-width sketch per map partition.
  *
  * Input: an already-hashed LONG column uniform in `[0, 2^60)` — the
  * repo's shared md5-derived 60-bit spelling
  * (`conv(substring(md5(x),1,15),16,10)`, DuckDB-twinned), so the
  * oracle replays the identical hash stream. NULL hashes are skipped.
  *
  * Estimate: EXACT below the sketch size — fewer than `k` distinct
  * hashes means the state IS the distinct set and the count is
  * returned verbatim (the harmonic-sketch equivalence discipline);
  * at `k` the classic KMV estimator `(k−1) · 2^60 DIV U_k` (U_k =
  * k-th smallest), integer division throughout.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression] {

  require(k >= 2 && k <= 4096, s"KmvDistinct: k must be in [2, 4096], got $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct expects a BIGINT hash column, got ${child.dataType.catalogString}")
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, input: KmvState): KmvState = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: KmvState): Any =
    if (buffer.n < k) buffer.n.toLong
    else {
      // (k−1)·2^60 overflows Long for k > 8: exact BigInt division,
      // clamped at the hash-space size (more distinct values than the
      // space holds is not a claimable estimate) — the DuckDB twin does
      // the same arithmetic in HUGEINT
      val space = graft.pipeline.LinkGraph.KmvSpace
      val u = math.max(buffer.arr(k - 1), 1L)
      (BigInt(k - 1) * space / u).min(BigInt(space)).toLong
    }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buffer.n + 1))
    bb.putLong(buffer.n.toLong)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val st = new KmvState(k)
    st.n = n
    var i = 0
    while (i < n) { st.arr(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Aggregate `Column`: KMV distinct estimate over a 60-bit hash
    * column (`hashCol` must already be the shared md5-derived hash).
    */
  def of(hashCol: Column, k: Int = 256): Column =
    GraftSqlBridge.column(
      KmvDistinct(GraftSqlBridge.expression(hashCol), k).toAggregateExpression())

  /** The repo's shared md5-derived 60-bit hash of a string column —
    * uniform in `[0, 2^60)`, DuckDB twin
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. The ONE spelling
    * every KMV call site shares (a site that also wants the exact
    * `count(DISTINCT)` arm names this once and feeds both aggregates).
    */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  }

  /** KMV distinct estimate over a raw STRING column — [[hash60]]
    * composed into [[of]], for sites that need no exact twin column.
    */
  def ofString(c: Column, k: Int = 256): Column = of(hash60(c), k)
}
