package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate without a shuffle exchange") {
    val a = (1 to 1000).map(i => (s"S${i % 20}", i.toLong, i * 1.5)).toDF("symbol", "ts", "price")
    val b = (1 to 500).map(i => (s"S${i % 20}", i.toLong, i * 2L)).toDF("symbol", "ts", "volume")
    Layout.writeBucketed(a, "bucketed_a", "symbol", 8)
    Layout.writeBucketed(b, "bucketed_b", "symbol", 8)
    try {
      val ta = spark.table("bucketed_a")
      val tb = spark.table("bucketed_b")
      // co-located join on the bucket key: no exchange on either side
      val joined = ta.join(tb, Seq("symbol"))
      joined.count()
      assert(!Layout.hasShuffle(joined),
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      // groupBy on the bucket key: aggregation without exchange
      val agg = ta.groupBy("symbol").agg(sum(col("price")))
      agg.count()
      assert(!Layout.hasShuffle(agg))
      // sanity: the same join over unbucketed frames DOES shuffle
      // (disable auto-broadcast so the tiny fixtures don't take the BHJ path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plain = a.join(b, Seq("symbol"))
        plain.count()
        assert(Layout.hasShuffle(plain))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
