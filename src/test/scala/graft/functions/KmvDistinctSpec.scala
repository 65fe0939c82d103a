package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KmvDistinct]] — the count-distinct sketch: exact below k,
  * deterministic, partition-shape-independent (map-side merge is a
  * min-union), duplicate- and null-blind.
  */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, copies: Int = 1) =
    (0 until n).flatMap(i => Seq.fill(copies)(s"value_$i")).toDF("v")
      .select(expr("cast(conv(substring(md5(v), 1, 15), 16, 10) as bigint)").as("hv"))

  test("exact below the sketch size, regardless of partitioning and duplicates") {
    for (parts <- Seq(1, 7); copies <- Seq(1, 3)) {
      val got = hashed(100, copies).repartition(parts)
        .agg(KmvDistinct.of(col("hv"), 256).as("est"))
        .head.getLong(0)
      assert(got == 100L, s"parts=$parts copies=$copies: got $got")
    }
  }

  test("estimate is deterministic, partition-independent, and in the right range") {
    val ests = Seq(1, 13).map { parts =>
      hashed(20000).repartition(parts)
        .agg(KmvDistinct.of(col("hv"), 64).as("est")).head.getLong(0)
    }
    assert(ests.distinct.size == 1, s"partitioning changed the estimate: $ests")
    // k=64 has ~13% relative stddev; a 40% band is far outside flake range
    assert(ests.head > 12000L && ests.head < 28000L, s"estimate ${ests.head} implausible for 20000")
  }

  test("null hashes are skipped; empty input estimates 0") {
    val withNulls = Seq(Some(5L), None, Some(9L), None, Some(5L)).toDF("hv")
    assert(withNulls.agg(KmvDistinct.of(col("hv"), 16)).head.getLong(0) == 2L)
    assert(Seq.empty[Long].toDF("hv").agg(KmvDistinct.of(col("hv"), 16)).head.getLong(0) == 0L)
  }

  test("grouped aggregation: each group carries its own sketch") {
    val df = (0 until 300).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
      .select(col("g"),
        expr("cast(conv(substring(md5(v), 1, 15), 16, 10) as bigint)").as("hv"))
    val got = df.groupBy("g").agg(KmvDistinct.of(col("hv"), 256).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L), s"got $got")
  }
}
