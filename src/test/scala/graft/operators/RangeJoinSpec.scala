package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoin vs the naive inequality-join oracle (`p >= start AND p <= end`
  * as a raw join predicate — what DuckDB evaluates with IEJoin and Spark
  * with a nested-loop join). The banded rewrite must produce identical
  * pairs for every bucket width, including widths far off the interval
  * scale, negative coordinates, and nanosecond-magnitude longs where
  * double-precision bucketing would round wrong.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naiveRangeJoin(points: DataFrame, intervals: DataFrame): DataFrame =
    points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.ts") >= col("i.s") && col("p.ts") <= col("i.e"))
      .select(col("p.k").as("k"), col("p.ts").as("ts"), col("p.v").as("v"),
        col("i.s").as("s"), col("i.e").as("e"))

  private def check(points: DataFrame, intervals: DataFrame, width: Long): Unit = {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", width)
    val want = naiveRangeJoin(points, intervals)
    val g = got.select("k", "ts", "v", "s", "e").collect().map(_.toSeq)
    val w = want.collect().map(_.toSeq)
    // pairs can legitimately repeat (duplicate points) — compare as multisets
    val gm = g.groupBy(identity).view.mapValues(_.length).toMap
    val wm = w.groupBy(identity).view.mapValues(_.length).toMap
    assert(gm == wm, s"range-join mismatch at width=$width: " +
      s"only-got=${(gm.keySet -- wm.keySet).take(5)} only-want=${(wm.keySet -- gm.keySet).take(5)}")
  }

  private def randomFixture(seed: Long, scale: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("aa", "bb")
    def ts(): Long = scale + rnd.nextInt(1000).toLong - 500L
    val points = (0 until 300).map(i => (keys(rnd.nextInt(2)), ts(), i.toLong))
      .toDF("k", "ts", "v")
    val intervals = (0 until 60).map { _ =>
      val a = ts(); val b = ts()
      (keys(rnd.nextInt(2)), math.min(a, b), math.max(a, b))
    }.toDF("k", "s", "e")
    (points, intervals)
  }

  test("property: matches the naive inequality join across widths, including negative coords") {
    for (seed <- 1L to 3L; width <- Seq(1L, 7L, 100L, 5000L)) {
      val (p, i) = randomFixture(seed, scale = 0L) // coords straddle zero
      check(p, i, width)
    }
  }

  test("property: nanosecond-epoch magnitudes bucket exactly (double floor-div would misplace boundary rows)") {
    // ~1.7e18 needs 61 bits; double-rounding floor(col/width) errs by up to
    // ~128 near bucket boundaries, silently dropping boundary matches
    val base = 1700000000000000000L
    for (seed <- 7L to 8L) {
      val (p, i) = randomFixture(seed, scale = base)
      check(p, i, 512L)   // boundary every 512 — rounding error spans it
      check(p, i, 3600L * 1000000000L) // 1h-in-nanos buckets: all rows straddle one boundary
    }
  }

  test("boundary inclusivity: point == start and point == end both match") {
    val points = Seq(("aa", 10L, 1L), ("aa", 20L, 2L), ("aa", 9L, 3L), ("aa", 21L, 4L))
      .toDF("k", "ts", "v")
    val intervals = Seq(("aa", 10L, 20L)).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 7L)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("empty interval (start > end) matches nothing, like the raw predicate") {
    val points = Seq(("aa", 10L, 1L)).toDF("k", "ts", "v")
    val intervals = Seq(("aa", 20L, 5L)).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 7L)
    assert(got.count() == 0)
    check(points, intervals, 7L)
  }

  test("degenerate span fails fast with an error naming the offending interval") {
    val points = Seq(("aa", 10L, 1L)).toDF("k", "ts", "v")
    val intervals = Seq(("aa", 0L, Long.MaxValue)).toDF("k", "s", "e")
    val e = intercept[Exception] { // SparkRuntimeException(USER_RAISED_EXCEPTION)
      RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 86400L).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("RangeJoin") && msg.contains("9223372036854775807"),
      s"expected a fail-fast span error, got: $msg")
  }

  test("a wide-but-capped span still joins correctly when under the cap") {
    val points = Seq(("aa", 500000L, 1L), ("aa", 999L, 2L)).toDF("k", "ts", "v")
    val intervals = Seq(("aa", 1000L, 1000000L)).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 1L,
      maxBucketsPerInterval = 2000000L)
    assert(got.select("v").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("collision guards reject ambiguous shapes") {
    val p = Seq(("aa", 1L, 1L)).toDF("k", "ts", "v")
    val i = Seq(("aa", 0L, 2L)).toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p.withColumn("s", lit(1L)), i, Seq("k"), "ts", "s", "e", 1L)
    }
    assert(e1.getMessage.contains("s"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p.withColumn("__bucket", lit(1L)), i, Seq("k"), "ts", "s", "e", 1L)
    }
    assert(e2.getMessage.contains("__bucket"))
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, i, Seq("k"), "ts", "s", "e", 0L)
    }
    assert(e3.getMessage.contains("bucketWidth"))
  }

  // --------------------------------------------------- interval overlap

  private def naiveOverlap(left: DataFrame, right: DataFrame): DataFrame =
    left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.k").as("k"), col("a.s").as("s"), col("a.e").as("e"),
        col("a.id").as("id"), col("b.s").as("r_s"), col("b.e").as("r_e"),
        col("b.id").as("r_id"))

  private def checkOverlap(left: DataFrame, right: DataFrame, width: Long): Unit = {
    val got = RangeJoin.intervalOverlap(left, right, Seq("k"), "s", "e", "s", "e", width)
    val cols = Seq("k", "s", "e", "id", "r_s", "r_e", "r_id")
    val g = got.select(cols.map(col): _*).collect().map(_.toSeq)
    val w = naiveOverlap(left, right).collect().map(_.toSeq)
    val gm = g.groupBy(identity).view.mapValues(_.length).toMap
    val wm = w.groupBy(identity).view.mapValues(_.length).toMap
    assert(gm == wm, s"overlap mismatch at width=$width: " +
      s"only-got=${(gm.keySet -- wm.keySet).take(5)} only-want=${(wm.keySet -- gm.keySet).take(5)}")
  }

  private def randomIntervals(seed: Long, n: Int, scale: Long = 0L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("aa", "bb")
    (0 until n).map { i =>
      val a = scale + rnd.nextInt(1000).toLong - 500L
      val b = scale + rnd.nextInt(1000).toLong - 500L
      (keys(rnd.nextInt(2)), math.min(a, b), math.max(a, b), i.toLong)
    }.toDF("k", "s", "e", "id")
  }

  test("overlap property: matches the naive two-sided inequality join, exactly once per pair") {
    for (seed <- 1L to 3L; width <- Seq(1L, 7L, 100L, 5000L))
      checkOverlap(randomIntervals(seed, 60), randomIntervals(seed + 100, 60), width)
    // negative-coordinate band (exercises truncating-div monotonicity)
    checkOverlap(randomIntervals(7, 50, -2000L), randomIntervals(8, 50, -2000L), 13L)
  }

  test("overlap boundaries: touching intervals match; disjoint same-bucket intervals do not") {
    val a = Seq(("aa", 0L, 10L, 1L)).toDF("k", "s", "e", "id")
    val touching = Seq(("aa", 10L, 20L, 2L)).toDF("k", "s", "e", "id")
    val disjoint = Seq(("aa", 11L, 20L, 3L)).toDF("k", "s", "e", "id")
    assert(RangeJoin.intervalOverlap(a, touching, Seq("k"), "s", "e", "s", "e", 100L).count() == 1)
    assert(RangeJoin.intervalOverlap(a, disjoint, Seq("k"), "s", "e", "s", "e", 100L).count() == 0)
    // empty right interval (s > e) matches nothing
    val empty = Seq(("aa", 9L, 5L, 4L)).toDF("k", "s", "e", "id")
    assert(RangeJoin.intervalOverlap(a, empty, Seq("k"), "s", "e", "s", "e", 100L).count() == 0)
  }

  test("overlap guards: span cap fails fast; prefixed-name collisions rejected") {
    val a = Seq(("aa", 0L, 10L, 1L)).toDF("k", "s", "e", "id")
    val degenerate = Seq(("aa", 0L, Long.MaxValue / 2, 2L)).toDF("k", "s", "e", "id")
    val err = intercept[Exception] {
      RangeJoin.intervalOverlap(a, degenerate, Seq("k"), "s", "e", "s", "e", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("spans")), s"expected the span-cap error, got $err")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a.withColumn("r_id", lit(1L)), a, Seq("k"), "s", "e", "s", "e", 10L)
    }
    assert(e2.getMessage.contains("r_id"))
  }
}
