package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // skewed: 1000 rows on key "hot", a few elsewhere
  private lazy val large = ((1 to 1000).map(i => ("hot", i.toLong)) ++
    Seq(("a", 1L), ("b", 2L))).toDF("k", "v")
  private lazy val small = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "label")

  test("saltedJoin equals the plain join (inner and left)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "v").collect().toSeq
    assert(canon(Salting.saltedJoin(large, small, "k", 8))
      == canon(large.join(small, Seq("k"), "inner")))
    assert(canon(Salting.saltedJoin(large, small, "k", 8, "left"))
      == canon(large.join(small, Seq("k"), "left")))
  }

  test("salt actually spreads the hot key over multiple buckets") {
    val buckets = large.withColumn("__salt", Salting.saltCol(large, 8))
      .where(col("k") === "hot").select("__salt").distinct().count()
    assert(buckets > 4) // 1000 distinct rows over 8 salts
  }

  test("saltColSpread spreads BIT-IDENTICAL duplicate rows evenly; saltCol pins them to one bucket") {
    // 1024 exact copies of one row: the documented saltCol limit (full-row
    // hash -> one bucket) vs the opt-in row-local disambiguator
    val dups = (1 to 1024).map(_ => ("hot", 42L)).toDF("k", "v")
      .repartition(8) // several input partitions, like a real scan
    assert(dups.withColumn("__salt", Salting.saltCol(dups, 8))
      .select("__salt").distinct().count() == 1L)
    val spreadCounts = dups.withColumn("__salt", Salting.saltColSpread(dups, 8))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(spreadCounts.length == 8, "duplicates should reach every bucket")
    assert(spreadCounts.max <= 4L * spreadCounts.min,
      s"spread should be roughly even, got ${spreadCounts.toSeq}")
  }

  test("saltedJoin/saltedAggSum with spreadDuplicates stay result-equal on duplicate-heavy input") {
    val dups = ((1 to 500).map(_ => ("hot", 7L)) ++ Seq(("a", 1L))).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df.orderBy("k", "v").collect().toSeq
    assert(canon(Salting.saltedJoin(dups, small, "k", 8, "inner", spreadDuplicates = true))
      == canon(dups.join(small, Seq("k"), "inner")))
    assert(Salting.saltedAggSum(dups, Seq("k"), "v", 8, spreadDuplicates = true)
      .orderBy("k").collect().toSeq
      == dups.groupBy("k").agg(sum(col("v")).as("sum_v")).orderBy("k").collect().toSeq)
  }

  test("saltedAggSum equals the direct aggregation") {
    val salted = Salting.saltedAggSum(large, Seq("k"), "v", 8)
      .orderBy("k").collect().toSeq
    val direct = large.groupBy("k").agg(sum(col("v")).as("sum_v"))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("hotKeys flags only keys above the threshold share, with counts") {
    // "hot" holds 1000/1002 rows (~998004 ppm); a and b hold ~998 ppm each
    val hot = Salting.hotKeys(large, Seq("k"), thresholdPpm = 50000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot == Map("hot" -> 1000L))
    // threshold below the small keys' share flags everything
    val all = Salting.hotKeys(large, Seq("k"), thresholdPpm = 500L)
      .collect().map(_.getString(0)).toSet
    assert(all == Set("hot", "a", "b"))
  }

  test("hotKeyStats adds the ts range that sizes the mitigation span") {
    val stats = Salting.hotKeyStats(large, Seq("k"), "v", thresholdPpm = 50000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(stats == Map("hot" -> ((1000L, 1L, 1000L))))
  }
}
