package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampType}

/** Backward as-of join — for every left row, attach the payload of the most
  * recent right row with `right.ts <= left.ts` within the same key group
  * (equal timestamps match), optionally bounded by a tolerance window.
  *
  * The reference engine has no as-of join (SURVEY.md §2 negative space: "no
  * theta/range/as-of joins"), but it is the canonical time-series operator a
  * market-data consumer layers on top of merged history (trade → prevailing
  * quote), and Spark has no built-in either — `join` on an inequality
  * degenerates to a broadcast-nested-loop over every (left, right) pair per
  * key.
  *
  * Implementation is the scalable union-carry form, not a join node:
  * tag both inputs, union them, and carry the last right row forward with a
  * running `last(_, ignoreNulls)` window ordered by `(ts, side)` — right
  * rows sort before left rows at equal timestamps, which yields the
  * inclusive (<=) match. The matched timestamp and ALL payload columns are
  * carried as ONE struct, so every output row's payload comes from exactly
  * the matched right row — a right row whose payload value is NULL yields
  * that NULL (never a stale value back-filled from an older row), matching
  * DuckDB ASOF LEFT JOIN semantics. The whole operator is ONE shuffle on
  * the key columns plus a sort within partitions: cost is O(|L|+|R|) rows
  * through a single exchange regardless of how many left rows match each
  * right row, so it survives 100 TB where a range-predicate join explodes.
  * Skewed keys shard like any other window (salt upstream if one symbol
  * dominates).
  *
  * Requirements: right rows must be unique per (keys, rightTs) — with
  * duplicates the carried payload would depend on intra-partition order.
  * Pre-aggregate the right side (e.g. `max_by(payload, arrival)`) first.
  */
object AsOfJoin {

  private val Reserved = Seq("__t", "__side", "__c", "__mt", "__bkt", "__s", "__prev")

  /** Exact integer floor division of `__t` by `span`: `div` truncates toward
    * zero, so on its own bucket 0 would span (-span, span) — twice every
    * other bucket's width; subtracting 1 when the remainder is negative
    * (Spark's % takes the dividend's sign) restores uniform widths with no
    * double math. Package-visible so the spec can assert uniformity
    * directly.
    */
  private[operators] def floorBucket(span: Long): org.apache.spark.sql.Column =
    expr(s"(__t div ${span}L) - (case when __t % ${span}L < 0 then 1 else 0 end)")

  /** @param keys       equi-join key columns (present in both inputs)
    * @param leftTs     left event-time column (numeric or timestamp)
    * @param rightTs    right event-time column (same type as leftTs)
    * @param payload    right-side columns to attach to each left row
    * @param tolerance  max allowed `leftTs - rightTs`; in ts units for
    *                   numeric ts columns, in SECONDS for timestamp
    *                   columns; matches older than this become NULL
    * @param matchedTs  output column name holding the matched right ts
    */
  /** Shared validation + side-tagged union: right rows get `__side=0`
    * (sorting before left rows at equal `__t`, which yields the inclusive
    * backward match), left rows `__side=1`. Returns (union, left-only
    * column names, ts type).
    */
  private def tagged(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      matchedTs: String): (DataFrame, Seq[String], org.apache.spark.sql.types.DataType) = {
    val leftCols = left.columns.toSet
    val missingK = (keys.filterNot(leftCols) ++ keys.filterNot(right.columns.contains)).distinct
    require(missingK.isEmpty, s"key columns absent from an input: ${missingK.mkString(", ")}")
    require(payload.forall(right.columns.contains),
      s"payload columns absent from right: ${payload.filterNot(right.columns.contains).mkString(", ")}")
    val collisions = payload.filter(leftCols)
    require(collisions.isEmpty,
      s"payload columns collide with left columns (rename one side): ${collisions.mkString(", ")}")
    require(!leftCols(matchedTs) && !payload.contains(matchedTs),
      s"matchedTs '$matchedTs' collides with an existing output column")
    val reservedHits = Reserved.filter(r => leftCols(r) || payload.contains(r) || keys.contains(r))
    require(reservedHits.isEmpty,
      s"reserved internal names in inputs: ${reservedHits.mkString(", ")}")

    val leftOnly = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val tsType = left.schema(leftTs).dataType

    val rightSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast(tsType).as("__t"), lit(0).as("__side")) ++
        payload.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftOnly.map(col): _*)
    (rightSide.unionByName(leftSide), leftOnly, tsType)
  }

  /** The atomic (matched ts, payload...) struct: non-null exactly on right
    * rows — even when every payload value inside is null — so an
    * ignoreNulls carry skips left rows only and ts/payload can never come
    * from different right rows.
    */
  private def carryStruct(payload: Seq[String]) =
    when(col("__side") === 0, struct(col("__t").as("__mt") +: payload.map(col): _*))

  /** Shared tail of the backward carry: tolerance gating + final projection
    * of left rows that carry `__c` (the matched struct).
    */
  private def finishBackward(
      carried: DataFrame,
      keys: Seq[String],
      leftTs: String,
      leftOnly: Seq[String],
      payload: Seq[String],
      tolerance: Option[Long],
      matchedTs: String,
      tsType: org.apache.spark.sql.types.DataType): DataFrame = {
    // timestamps subtract to an interval, not a number — compare in epoch
    // seconds when the ts column is a timestamp (tolerance is in seconds)
    def asNum(c: org.apache.spark.sql.Column) =
      if (tsType == TimestampType) c.cast("long") else c
    val inTol = tolerance match {
      case Some(tol) =>
        col("__c").isNotNull && (asNum(col("__t")) - asNum(col("__c.__mt")) <= tol)
      case None => col("__c").isNotNull
    }
    carried.select(
      keys.map(col) ++
        Seq(col("__t").as(leftTs)) ++
        leftOnly.map(col) ++
        Seq(when(inTol, col("__c.__mt")).as(matchedTs)) ++
        payload.map(c => when(inTol, col(s"__c.$c")).as(c)): _*)
  }

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    val (union, leftOnly, tsType) =
      tagged(left, right, keys, leftTs, rightTs, payload, matchedTs)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = union
      .withColumn("__c", last(carryStruct(payload), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    finishBackward(carried, keys, leftTs, leftOnly, payload, tolerance, matchedTs, tsType)
  }

  /** Skew-safe backward as-of join — identical semantics to [[backward]],
    * but the per-key timeline is range-bucketed into fixed `span`-wide time
    * buckets so ONE hot key no longer serializes into one partition (the
    * documented limitation of the plain carry: "salt upstream if one symbol
    * dominates"). Three-stage plan, all shuffles keyed (keys, bucket) or
    * tiny:
    *
    *  1. per-(key, bucket) summary: the LAST right row of each bucket
    *     (max_by over the carry struct) — map-side combinable aggregate;
    *  2. bucket-boundary state: a window over the per-key BUCKET LIST
    *     (rows = distinct buckets, ~rows/span smaller than the data) carries
    *     the last summary strictly before each bucket; the only per-key
    *     serial pass runs on this tiny frame;
    *  3. each bucket receives its boundary state as one synthetic right row
    *     (its genuine origin ts sorts before every in-bucket row by
    *     construction), and the carry window now partitions by
    *     (keys, bucket) — a hot key splits across timeline/span partitions.
    *
    * Bucket ids use exact integer FLOOR division (`div` corrected for
    * negative remainders): monotonic in ts, exact for the full Long range —
    * never double arithmetic, which silently mis-buckets past 2^53 — and
    * uniform `span` width on BOTH sides of the origin (truncating `div`
    * alone would give bucket 0 double width over (-span, span), degrading
    * the skew split exactly where time-reversed positive-epoch data lands).
    * Integral ts columns only.
    *
    * Choose `span` near the left side's typical match distance × a few
    * thousand: too small multiplies the summary pass; too large under-splits
    * the hot key. Equal output to [[backward]] for every span.
    */
  def backwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      span: Long,
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    require(span > 0, s"span must be positive, got $span")
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral(left.schema(leftTs).dataType) && integral(right.schema(rightTs).dataType),
      "salted as-of requires integral ts columns (div bucketing; convert timestamps with unix_timestamp first)")
    val (union, leftOnly, tsType) =
      tagged(left, right, keys, leftTs, rightTs, payload, matchedTs)
    val u = union.withColumn("__bkt", floorBucket(span))

    // 1. last right row per (key, bucket), as the same atomic carry struct
    val summary = u.where(col("__side") === 0)
      .groupBy((keys :+ "__bkt").map(col): _*)
      .agg(max_by(struct(col("__t").as("__mt") +: payload.map(col): _*), col("__t")).as("__s"))
    // 2. state strictly before each bucket, over every bucket either side
    //    touches (a left-only bucket still needs the handoff)
    val allBuckets = u.select((keys :+ "__bkt").map(col): _*).distinct()
    val wState = Window.partitionBy(keys.map(col): _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = allBuckets.join(summary, keys :+ "__bkt", "left")
      .withColumn("__prev", last(col("__s"), ignoreNulls = true).over(wState))
      .where(col("__prev").isNotNull)
    // 3. one synthetic right row per bucket at the carried row's ORIGIN ts
    //    (strictly below every in-bucket ts since it comes from an earlier
    //    bucket), then the plain carry partitioned by (keys, bucket)
    val synthetic = boundary.select(
      keys.map(col) ++
        Seq(col("__prev.__mt").cast(tsType).as("__t"), lit(0).as("__side")) ++
        payload.map(c => col(s"__prev.$c").as(c)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__bkt"): _*)
    val w = Window.partitionBy((keys :+ "__bkt").map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.unionByName(synthetic)
      .withColumn("__c", last(carryStruct(payload), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    finishBackward(carried, keys, leftTs, leftOnly, payload, tolerance, matchedTs, tsType)
  }

  /** Auto-dispatched backward as-of join — measures the key distribution
    * and picks [[backward]] (uniform keys) or [[backwardSalted]] (one or
    * more keys hold ≥ `thresholdPpm` of the rows), sizing `span` so the
    * WORST offender's timeline splits into ~`targetBuckets` buckets. Users
    * stop hand-choosing the variant and hand-sizing the span.
    *
    * The detection is ONE deterministic aggregation over both inputs'
    * (keys, ts) — [[Salting.hotKeyStats]]: no sampling, so a re-run or a
    * retried task reaches the IDENTICAL plan (the decision feeds plan
    * construction), and only key-level stats ever reach the driver
    * (≤ 1e6/thresholdPpm rows by construction). The span derives from the
    * maximal (n_rows, ts-range) offender; ties agree on the range, so tie
    * order cannot perturb the chosen span either. This is a plan-build
    * action — callers composing many as-ofs over the same inputs should
    * detect once and call the sized variant directly.
    *
    * Output equals [[backward]] for every dispatch outcome (the salted
    * property tests prove span-independence). Integral ts columns only —
    * the salted path requires them, and dispatch must not change the
    * accepted input domain based on data.
    */
  def auto(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts",
      thresholdPpm: Long = 50000L,
      targetBuckets: Int = 32): DataFrame = {
    require(targetBuckets > 0, s"targetBuckets must be positive, got $targetBuckets")
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral(left.schema(leftTs).dataType) && integral(right.schema(rightTs).dataType),
      "auto as-of requires integral ts columns (div bucketing; convert timestamps with unix_timestamp first)")
    // null timestamps are excluded from DETECTION (min/max of a key whose
    // ts are all null would read back as 0 through the primitive getters
    // and silently mis-size the span); the join itself still sees them
    val l = left.select(keys.map(col) :+ col(leftTs).cast("long").as("__t"): _*)
    val r = right.select(keys.map(col) :+ col(rightTs).cast("long").as("__t"): _*)
    val hot = Salting.hotKeyStats(
        l.unionByName(r).where(col("__t").isNotNull), keys, "__t", thresholdPpm)
      .select("n_rows", "ts_min", "ts_max").collect()
    if (hot.isEmpty)
      backward(left, right, keys, leftTs, rightTs, payload, tolerance, matchedTs)
    else {
      val worst = hot.maxBy(row => (row.getLong(0), row.getLong(2) - row.getLong(1)))
      val span = math.max(1L, (worst.getLong(2) - worst.getLong(1)) / targetBuckets)
      backwardSalted(left, right, keys, leftTs, rightTs, payload, span, tolerance, matchedTs)
    }
  }

  /** [[auto]] for the forward direction — the same detector and dispatch
    * through the shared [[timeReversed]] core. Negation preserves both the
    * per-key counts and the ts ranges the detector sizes the span from, so
    * the dispatch decision is identical to what the backward form would
    * make on the reversed timeline. Integral ts columns only.
    */
  def autoForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts",
      thresholdPpm: Long = 50000L,
      targetBuckets: Int = 32): DataFrame =
    timeReversed(left, right, leftTs, rightTs, matchedTs)(
      auto(_, _, keys, leftTs, rightTs, payload, tolerance, matchedTs,
        thresholdPpm, targetBuckets))

  /** Nearest as-of join — for every left row, the right row minimizing
    * `|rightTs - leftTs|` (within `tolerance` on BOTH sides), ties broken
    * BACKWARD (pandas merge_asof direction='nearest' semantics; an
    * equal-timestamp right row is a distance-0 backward match).
    *
    * STILL one shuffle: the backward carry (`last` over the preceding
    * frame) and the forward carry (`first` over the following frame) are
    * two window functions over the SAME partitioning and sort — Catalyst
    * plans one Exchange + one Sort and evaluates both in a single Window
    * operator. Numeric ts columns only.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    require(left.schema(leftTs).dataType.isInstanceOf[NumericType] &&
        right.schema(rightTs).dataType.isInstanceOf[NumericType],
      "nearest as-of requires numeric ts columns (convert timestamps with unix_timestamp first)")
    val (union, leftOnly, _) =
      tagged(left, right, keys, leftTs, rightTs, payload, matchedTs)
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carry = carryStruct(payload)
    val carried = union
      .withColumn("__cb", last(carry, ignoreNulls = true).over(wPrev))
      .withColumn("__cf", first(carry, ignoreNulls = true).over(wNext))
      .where(col("__side") === 1)

    val db = col("__t") - col("__cb.__mt") // >= 0 when __cb defined
    val df = col("__cf.__mt") - col("__t") // >= 0 when __cf defined
    def within(dist: org.apache.spark.sql.Column) =
      tolerance.map(t => dist <= t).getOrElse(lit(true))
    val validB = col("__cb").isNotNull && within(db)
    val validF = col("__cf").isNotNull && within(df)
    // backward wins ties (and equal-ts rows live in the preceding frame)
    val pick = when(validB && (!validF || db <= df), col("__cb"))
      .when(validF, col("__cf"))
    carried.select(
      keys.map(col) ++
        Seq(col("__t").as(leftTs)) ++
        leftOnly.map(col) ++
        Seq(pick.getField("__mt").as(matchedTs)) ++
        payload.map(c => pick.getField(c).as(c)): _*)
  }

  /** The time-reversal composition shared by both forward variants: negate
    * both timelines, run a backward implementation, un-negate the left and
    * matched ts columns. Lives in ONE place so a future reversal fix (e.g.
    * extra ts output columns) cannot diverge between the variants.
    */
  private def timeReversed(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      matchedTs: String)(
      runBackward: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val negL = left.withColumn(leftTs, negate(col(leftTs)))
    val negR = right.withColumn(rightTs, negate(col(rightTs)))
    runBackward(negL, negR)
      .withColumn(leftTs, negate(col(leftTs)))
      .withColumn(matchedTs, negate(col(matchedTs)))
  }

  /** Skew-safe forward as-of join — [[forward]]'s semantics with
    * [[backwardSalted]]'s time-bucketed plan, via the same negation trick:
    * time reversal turns "earliest at or after" into "most recent at or
    * before", and floor-division bucket ids stay monotonic in the negated
    * timeline (all the carry needs) with uniform `span` width on both sides
    * of the origin. Integral ts columns only.
    */
  def forwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      span: Long,
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    require(left.schema(leftTs).dataType.isInstanceOf[NumericType] &&
        right.schema(rightTs).dataType.isInstanceOf[NumericType],
      "forward as-of requires numeric ts columns (negate-based reversal; " +
        "convert timestamps with unix_timestamp first)")
    timeReversed(left, right, leftTs, rightTs, matchedTs)(
      backwardSalted(_, _, keys, leftTs, rightTs, payload, span, tolerance, matchedTs))
  }

  /** Forward as-of join — for every left row, attach the payload of the
    * EARLIEST right row with `right.ts >= left.ts` (equal timestamps
    * match), optionally bounded by `tolerance >= rightTs - leftTs`.
    *
    * Implemented as [[backward]] over NEGATED timestamps — time reversal
    * turns "most recent at or before" into "earliest at or after", so the
    * forward join inherits the backward carry's single-shuffle plan, its
    * atomic struct carry, and every guard, with zero duplicated logic.
    * Numeric ts columns only (timestamps negate through their epoch —
    * convert with `unix_timestamp` first).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None,
      matchedTs: String = "matched_ts"): DataFrame = {
    require(left.schema(leftTs).dataType.isInstanceOf[NumericType] &&
        right.schema(rightTs).dataType.isInstanceOf[NumericType],
      "forward as-of requires numeric ts columns (negate-based reversal; " +
        "convert timestamps with unix_timestamp first)")
    timeReversed(left, right, leftTs, rightTs, matchedTs)(
      backward(_, _, keys, leftTs, rightTs, payload, tolerance, matchedTs))
  }
}
