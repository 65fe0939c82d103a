package graft.timeseries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ports of the reference merge properties
  * (borsa-core/tests/merge_props.rs:51-218, dedup_props.rs:45-93).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def series(prices: Seq[(Long, Int)]) =
    prices.map { case (ts, p) => ("S", ts, BigDecimal(p)) }.toDF("symbol", "ts", "close")

  test("first-wins invariant: on duplicate ts the earlier series wins (merge_props.rs:51,116)") {
    val a = series(Seq(100L -> 1, 200L -> 2))
    val b = series(Seq(200L -> 99, 300L -> 3))
    val out = Merge.mergeCandlesByPriority(Seq(a, b), Seq("symbol", "ts"))
      .orderBy("ts").collect()
    assert(out.map(r => (r.getAs[Long]("ts"), r.getAs[java.math.BigDecimal]("close").intValue())).toSeq
      == Seq((100L, 1), (200L, 2), (300L, 3)))
  }

  test("merge identity: merging a series with itself is a no-op (merge_props.rs:218)") {
    val a = series(Seq(100L -> 1, 200L -> 2, 300L -> 3))
    val out = Merge.mergeCandlesByPriority(Seq(a, a), Seq("symbol", "ts"))
    assert(out.orderBy("ts").collect().toSeq == a.orderBy("ts").collect().toSeq)
  }

  test("adjusted flag: first contributor AND all contributors (merge_props.rs:73)") {
    def meta(rows: (String, Long, Boolean, Boolean)*) =
      rows.toSeq.toDF("provider", "priority", "adjusted", "contributed")
    // first contributor adjusted, all adjusted -> true
    assert(Merge.mergedAdjustedFlag(meta(("a", 0L, true, true), ("b", 1L, true, true)))
      .collect()(0).getBoolean(0))
    // one contributor unadjusted -> false
    assert(!Merge.mergedAdjustedFlag(meta(("a", 0L, true, true), ("b", 1L, false, true)))
      .collect()(0).getBoolean(0))
    // non-contributing unadjusted source does not count (merge.rs:76-102)
    assert(Merge.mergedAdjustedFlag(meta(("a", 0L, true, true), ("b", 1L, false, false)))
      .collect()(0).getBoolean(0))
    // first contributor unadjusted -> false even if rest adjusted
    assert(!Merge.mergedAdjustedFlag(meta(("a", 0L, false, true), ("b", 1L, true, true)))
      .collect()(0).getBoolean(0))
  }

  test("action dedup: idempotent, canonical order (dedup_props.rs:45,93)") {
    val acts = Seq(
      (300L, "split", BigDecimal(2), "USD"),
      (100L, "dividend", BigDecimal(1), "USD"),
      (100L, "dividend", BigDecimal(1), "USD"), // dup
      (100L, "capital_gain", BigDecimal(3), "USD"),
      (100L, "split", BigDecimal(5), "USD"))
      .toDF("ts", "kind", "amount", "currency")
    val out = Merge.dedupActions(acts).collect()
    assert(out.length == 4)
    // canonical order: ts, then kind-rank dividend<split<capital_gain
    assert(out.map(_.getAs[String]("kind")).toSeq ==
      Seq("dividend", "split", "capital_gain", "split"))
    // idempotent
    val again = Merge.dedupActions(Merge.dedupActions(acts)).collect()
    assert(again.toSeq == out.toSeq)
  }

  test("firstWins keeps exactly one row per key with lowest priority") {
    val df = Seq(
      ("S", 1L, 0L, 10L, "a"), ("S", 1L, 1L, 20L, "b"),
      ("S", 2L, 1L, 30L, "b"), ("T", 1L, 2L, 40L, "c"))
      .toDF("symbol", "ts", "priority", "v", "src")
    val out = Merge.firstWins(df, Seq("symbol", "ts"), "priority")
      .orderBy("symbol", "ts").collect()
    assert(out.map(_.getAs[String]("src")).toSeq == Seq("a", "b", "c"))
  }
}
