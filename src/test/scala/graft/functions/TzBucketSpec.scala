package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DST-exact bucketing (R4): semantics pinned to
  * /root/reference/borsa-core/src/timeseries/resample.rs:212-277 and the
  * with_meta_dst_alignment property (resample_props.rs:173).
  */
class TzBucketSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(secs: Long, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
    Seq(secs).toDF("secs").select(c(col("secs")).as("b")).collect()(0).getLong(0)

  // 2024-03-10 America/New_York: 02:00 EST -> 03:00 EDT (gap)
  // 2024-11-03 America/New_York: 02:00 EDT -> 01:00 EST (overlap 01:00-01:59)
  private val NY = "America/New_York"

  test("plain local day bucket (no transition)") {
    // 2024-01-15 23:30 UTC = 18:30 EST -> local midnight 2024-01-15 05:00 UTC
    val ts = 1705361400L
    assert(bucketOf(ts, TzBucket.localDay(_, NY)) == 1705294800L)
  }

  test("day bucket around spring-forward keeps local midnight") {
    // 2024-03-10 12:00 UTC = 08:00 EDT; local midnight 2024-03-10 00:00 EST = 05:00 UTC
    val ts = 1710072000L
    assert(bucketOf(ts, TzBucket.localDay(_, NY)) == 1710046800L)
  }

  test("minute bucket in DST overlap disambiguates by the instant's offset") {
    // first 01:30 (EDT, UTC-4) = 2024-11-03 05:30 UTC -> bucket 01:00 EDT = 05:00 UTC
    val firstHalf = 1730611800L
    assert(bucketOf(firstHalf, TzBucket.localMinutes(_, NY, 60)) == 1730610000L)
    // second 01:30 (EST, UTC-5) = 06:30 UTC -> bucket 01:00 EST = 06:00 UTC
    val secondHalf = 1730615400L
    assert(bucketOf(secondHalf, TzBucket.localMinutes(_, NY, 60)) == 1730613600L)
    // the two halves land in DISTINCT buckets (resample.rs:258-266 intent)
  }

  test("minute bucket whose local start falls in the DST gap falls back to UTC") {
    // 2024-03-10 07:30 UTC = 03:30 EDT; 120-min bucket start = local 02:00
    // which does not exist -> UTC fallback: secs - secs % 7200
    val ts = 1710055800L
    assert(bucketOf(ts, TzBucket.localMinutes(_, NY, 120)) == ts - ts % 7200)
  }

  test("ambiguous local midnight picks the earlier instant (Havana fall-back at 01:00->00:00)") {
    // America/Havana 2024-11-03: 01:00 CDT -> 00:00 CST; 00:30 is ambiguous.
    // instant inside the repeated half hour: 2024-11-03 04:30 UTC = 00:30 CDT (first pass)
    val ts = 1730608200L
    // earlier mapping of local midnight 00:00 = 04:00 UTC (offset -4)
    assert(bucketOf(ts, TzBucket.localDay(_, "America/Havana")) == 1730606400L)
  }

  test("week bucket resolves to local Monday midnight") {
    // 2024-01-18 (Thu) 12:00 UTC -> Monday 2024-01-15 00:00 EST = 05:00 UTC
    val ts = 1705579200L
    assert(bucketOf(ts, TzBucket.localWeek(_, NY)) == 1705294800L)
  }

  test("agrees with UTC arithmetic for a UTC 'zone'") {
    val ts = 1710072000L
    assert(bucketOf(ts, TzBucket.localDay(_, "UTC")) == (ts - ts % 86400))
    assert(bucketOf(ts, TzBucket.localMinutes(_, "UTC", 5)) == (ts - ts % 300))
  }

  test("expression participates in codegen (no interpreter fallback errors) and is null-safe") {
    val out = Seq(Some(1710072000L), None).toDF("secs")
      .select(TzBucket.localDay(col("secs"), NY).as("b")).collect()
    assert(out(0).getLong(0) == 1710046800L)
    assert(out(1).isNullAt(0))
  }

  test("tz_bucket is SQL-callable after GraftExtensions registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT tz_bucket(1710072000L, 'America/New_York', 0L) AS day, " +
      "tz_bucket(1730611800L, 'America/New_York', 3600L) AS minute").collect()(0)
    assert(r.getLong(0) == 1710046800L)
    assert(r.getLong(1) == 1730610000L)
  }

  test("vec_dot is SQL-callable after GraftExtensions registration, NULL on length mismatch") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d, " +
      "vec_dot(array(1.0D), array(1.0D, 2.0D)) AS mismatch").collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.isNullAt(1))
  }
}
