package graft.timeseries

import graft.SparkSpec
import graft.timeseries.OhlcvAggregator._

class OhlcvAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("fused aggregator matches the 5-sub-aggregate kernel on grouped ticks") {
    val rnd = new scala.util.Random(11)
    val ticks = (0 until 500).map { i =>
      // unique ts per row: equal-ts open/close ties would be legitimately
      // nondeterministic in both implementations
      ("S" + rnd.nextInt(3), 1000L + i,
        BigDecimal(100 + rnd.nextInt(50)), if (i % 7 == 0) None else Some(rnd.nextInt(100).toLong))
    }
    // typed path: fused single-buffer aggregator
    val fused = ticks.toDS()
      .groupByKey(_._1)
      .mapValues(t => TickIn(t._2, t._3, t._4))
      .agg(instance.toColumn.name("c"))
      .collect().toMap
    // untyped path: R1 kernel
    val kernel = Resample.resampleTicks(
      ticks.toDF("symbol", "ts", "price", "volume").withColumn("secs", org.apache.spark.sql.functions.col("ts")),
      org.apache.spark.sql.functions.lit(0L))
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    fused.foreach { case (sym, out) =>
      val k = kernel(sym)
      assert(out.open == BigDecimal(k.getAs[java.math.BigDecimal]("open")), sym)
      assert(out.high == BigDecimal(k.getAs[java.math.BigDecimal]("high")), sym)
      assert(out.low == BigDecimal(k.getAs[java.math.BigDecimal]("low")), sym)
      assert(out.close == BigDecimal(k.getAs[java.math.BigDecimal]("close")), sym)
      assert(out.volume.contains(k.getAs[Long]("volume")), sym)
    }
  }

  test("volume saturates and all-NULL volume yields NULL") {
    val ticks = Seq(
      ("S", 1L, BigDecimal(1), Some(Long.MaxValue)),
      ("S", 2L, BigDecimal(2), Some(10L)),
      ("T", 1L, BigDecimal(3), Option.empty[Long]))
    val out = ticks.toDS()
      .map { case (s, ts, p, v) => (s, TickIn(ts, p, v)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(instance.toColumn.name("c"))
      .collect().toMap
    assert(out("S").volume.contains(Long.MaxValue))
    assert(out("T").volume.isEmpty)
  }
}
