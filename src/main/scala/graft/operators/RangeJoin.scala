package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — match each point row to every interval row
  * of the same key whose `[start, end]` (inclusive) contains the point.
  *
  * The reference engine has no range join (SURVEY.md §2 negative space), and
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` predicate as a
  * broadcast-nested-loop join: every point is tested against every interval
  * of its key — O(|P|·|I|) and a broadcast of one whole side. This operator
  * uses the standard banded ("bucketed") rewrite instead: intervals are
  * exploded to the fixed-width buckets they cover, points carry their own
  * bucket, and the match becomes an EQUI-join on (key, bucket) plus a cheap
  * residual filter. Each (point, interval) pair meets in exactly one bucket
  * — the point's — so no post-join dedup is needed.
  *
  * Scale: the equi-join shuffles on (key, bucket), which Catalyst plans as a
  * shuffled hash / sort-merge join with AQE skew splitting; cost is
  * O(|P| + Σ span/width) rows through one exchange. Pick `bucketWidth` near
  * the typical interval span: too small explodes intervals into many bucket
  * rows, too large piles unrelated points into each bucket and shifts work
  * into the residual filter.
  *
  * Robustness at scale:
  *  - bucket ids use INTEGRAL truncating division (`div`), never
  *    double-rounding `floor(col / width)` — nanosecond-epoch longs
  *    (~1.7e18) exceed a double's 2^53 integer range and would mis-bucket.
  *    Truncating division is monotonic in the dividend, which is all the
  *    rewrite needs: bucket(start) <= bucket(point) <= bucket(end) holds,
  *    so every containing interval still meets its point in the point's
  *    bucket even for negative coordinates.
  *  - a single degenerate span (e.g. a sentinel end of Long.MaxValue) would
  *    otherwise explode into span/width bucket rows and OOM one executor —
  *    or hard-fail at sequence()'s element cap with an opaque message. Any
  *    interval wider than `maxBucketsPerInterval` buckets fails FAST with
  *    an error naming the offending span. The guard feeds the sequence
  *    bounds themselves, so column pruning can never drop it.
  *  - empty intervals (start > end) match nothing — same semantics as the
  *    raw inequality predicate — rather than tripping sequence()'s
  *    descending mode and silently matching backwards.
  */
object RangeJoin {

  /** @param points      frame with `keys` and a numeric `ptCol`
    * @param intervals   frame with `keys`, numeric `startCol`/`endCol`
    *                    (inclusive bounds; rows with start > end match
    *                    nothing)
    * @param bucketWidth band width in ts units (> 0)
    * @param maxBucketsPerInterval fail-fast cap on span/bucketWidth per
    *                    interval row (default 1M buckets)
    * @return one row per matching (point, interval) pair: all point columns
    *         plus the interval's start/end (other interval columns dropped;
    *         join back on (keys, start, end) if more are needed)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val ptCols = points.columns.toSet
    val missingK = (keys.filterNot(ptCols) ++ keys.filterNot(intervals.columns.contains)).distinct
    require(missingK.isEmpty, s"key columns absent from an input: ${missingK.mkString(", ")}")
    require(intervals.columns.contains(startCol) && intervals.columns.contains(endCol),
      s"interval columns $startCol/$endCol absent from intervals")
    val dup = Seq(startCol, endCol).filter(c => ptCols(c) || keys.contains(c))
    require(dup.isEmpty,
      s"interval bound columns collide with point/key columns (rename them): ${dup.mkString(", ")}")
    require(!ptCols("__bucket") && !intervals.columns.contains("__bucket"),
      "reserved internal name __bucket present in an input")

    // SQL `div` is integral division (returns LONG) — exact for the full
    // long range, unlike floor(col / width) which routes through a double
    def bucketOf(name: String): Column = expr(s"`$name` div ${bucketWidth}L")
    val startB = bucketOf(startCol)
    val endB = bucketOf(endCol)
    // the cap guard is folded into the sequence's upper bound so no
    // optimizer rule can prune it away from under the explode
    val guardedEnd = when(endB - startB >= maxBucketsPerInterval,
        raise_error(format_string(
          s"RangeJoin: interval [%s, %s] spans %s buckets at bucketWidth=$bucketWidth " +
            s"(cap $maxBucketsPerInterval) — widen bucketWidth or filter degenerate spans",
          col(startCol), col(endCol), endB - startB + lit(1))).cast("long"))
      .otherwise(endB)

    val iv = intervals
      .where(col(startCol) <= col(endCol))
      .select(keys.map(col) ++ Seq(col(startCol), col(endCol),
        explode(sequence(startB, guardedEnd)).as("__bucket")): _*)
    val pt = points.withColumn("__bucket", bucketOf(ptCol))
    pt.join(iv, keys :+ "__bucket")
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join — one row per (left, right) pair of the same key
    * whose inclusive ranges intersect: `s1 <= e2 AND s2 <= e1`. The
    * companion primitive to [[pointInInterval]]; Spark would otherwise plan
    * the two-sided inequality as a BroadcastNestedLoopJoin.
    *
    * Both sides explode to their covered buckets and meet on an equi-join,
    * BUT an overlapping pair shares possibly-many buckets — instead of a
    * pair-wide dedup shuffle afterwards, each pair is emitted in exactly
    * ONE bucket: `greatest(bucket(s1), bucket(s2))`. That bucket is always
    * within both sides' exploded ranges when the pair overlaps (truncating
    * division is monotonic, so s2 <= e1 implies bucket(s2) <= bucket(e1)
    * and vice versa) — full recall, zero duplicates, no post-join distinct.
    *
    * Output: left columns + the right's key-stripped columns renamed with
    * `rightPrefix`. Bounds are validated by the same fail-fast span cap as
    * [[pointInInterval]]; empty ranges (start > end) match nothing.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      rightPrefix: String = "r_",
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val missingK = (keys.filterNot(left.columns.contains) ++
      keys.filterNot(right.columns.contains)).distinct
    require(missingK.isEmpty, s"key columns absent from an input: ${missingK.mkString(", ")}")
    require(left.columns.contains(leftStart) && left.columns.contains(leftEnd),
      s"bound columns $leftStart/$leftEnd absent from left")
    require(right.columns.contains(rightStart) && right.columns.contains(rightEnd),
      s"bound columns $rightStart/$rightEnd absent from right")
    val rightRenamed = right.columns.filterNot(keys.contains)
      .map(c => c -> s"$rightPrefix$c").toMap
    val collide = rightRenamed.values.filter(left.columns.contains).toSeq
    require(collide.isEmpty,
      s"prefixed right columns collide with left columns: ${collide.mkString(", ")}")
    val reserved = Seq("__bucket", "__sb", "__rsb")
    require(reserved.forall(r => !left.columns.contains(r) && !right.columns.contains(r)),
      "reserved internal names __bucket/__sb/__rsb present in an input")

    def bucketOf(name: String): Column = expr(s"`$name` div ${bucketWidth}L")
    def exploded(df: DataFrame, startCol: String, endCol: String): DataFrame = {
      val startB = bucketOf(startCol)
      val endB = bucketOf(endCol)
      val guardedEnd = when(endB - startB >= maxBucketsPerInterval,
          raise_error(format_string(
            s"RangeJoin: interval [%s, %s] spans %s buckets at bucketWidth=$bucketWidth " +
              s"(cap $maxBucketsPerInterval) — widen bucketWidth or filter degenerate spans",
            col(startCol), col(endCol), endB - startB + lit(1))).cast("long"))
        .otherwise(endB)
      df.where(col(startCol) <= col(endCol))
        .select(df.columns.map(col) :+ startB.as("__sb") :+
          explode(sequence(startB, guardedEnd)).as("__bucket"): _*)
    }
    val l = exploded(left, leftStart, leftEnd)
    val r = rightRenamed.foldLeft(
        exploded(right, rightStart, rightEnd).withColumnRenamed("__sb", "__rsb")) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
    l.join(r, keys :+ "__bucket")
      // emit-once: of all shared buckets, keep the pair only in
      // max(bucket(s1), bucket(s2)) — in range for both sides iff they
      // overlap, so no recall loss and no post-join dedup
      .where(col("__bucket") === greatest(col("__sb"), col("__rsb")))
      .where(col(leftStart) <= col(s"$rightPrefix$rightEnd") &&
             col(s"$rightPrefix$rightStart") <= col(leftEnd))
      .drop("__bucket", "__sb", "__rsb")
  }
}
