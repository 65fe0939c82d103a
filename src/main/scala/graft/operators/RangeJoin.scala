package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object RangeJoin {

  /** @param points      frame with `keys` and a numeric `ptCol`
    * @param intervals   frame with `keys`, numeric `startCol`/`endCol`
    *                    (inclusive bounds, start <= end)
    * @param bucketWidth band width in ts units (> 0)
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
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals.select(
      keys.map(col) ++ Seq(col(startCol), col(endCol),
        explode(sequence(
          floor(col(startCol) / bucketWidth).cast("long"),
          floor(col(endCol) / bucketWidth).cast("long"))).as("__bucket")): _*)
    val pt = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(iv, keys :+ "__bucket")
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
