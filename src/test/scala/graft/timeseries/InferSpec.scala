package graft.timeseries

import graft.SparkSpec

/** Ports of interval-inference properties
  * (borsa-core/tests/interval_infer.rs:28-136).
  */
class InferSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(tss: Seq[Long], sym: String = "S") =
    tss.zipWithIndex.map { case (ts, i) => (sym, ts, i.toLong) }
      .toDF("symbol", "secs", "arrival")

  private def step(tss: Seq[Long]): Option[Long] = {
    val rows = Infer.estimateStepSeconds(ticks(tss)).collect()
    rows.headOption.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
  }

  test("mode wins under noise (interval_infer.rs:28)") {
    // mostly 60s steps with one 300s outlier
    val tss = (0 until 20).map(i => 1000L + i * 60L) :+ (1000L + 19 * 60 + 300L)
    assert(step(tss) == Some(60L))
  }

  test("outlier immunity (interval_infer.rs:86)") {
    val tss = Seq(0L, 60L, 120L, 180L, 10000L, 10060L, 10120L)
    assert(step(tss) == Some(60L))
  }

  test("median tie-break when mode is not unique (interval_infer.rs:104)") {
    // deltas: 10,10,20,20,30 -> modes tie {10,20}; lower median of
    // [10,10,20,20,30] = 20 (index (5-1)/2 = 2)
    val tss = Seq(0L, 10L, 20L, 40L, 60L, 90L)
    assert(step(tss) == Some(20L))
  }

  test("degenerate: <2 distinct ts -> no estimate (interval_infer.rs:125)") {
    assert(step(Seq(100L)) == None)
    assert(step(Seq(100L, 100L)) == None) // equal ts: no positive delta
  }

  test("translation invariance (interval_infer.rs:136)") {
    val tss = Seq(0L, 60L, 120L, 180L, 240L)
    assert(step(tss) == step(tss.map(_ + 987654L)))
  }

  test("is_subdaily: >=3 deltas <1d and >=60% (infer.rs:122-158)") {
    def subdaily(tss: Seq[Long]): Boolean =
      Infer.isSubdaily(ticks(tss)).collect()(0).getAs[Boolean]("subdaily")
    // 4 hourly deltas -> subdaily
    assert(subdaily(Seq(0L, 3600L, 7200L, 10800L, 14400L)))
    // daily steps -> not subdaily
    assert(!subdaily(Seq(0L, 86400L, 172800L, 259200L, 345600L)))
    // 3 subdaily of 10 deltas (30%) -> fails the 60% rule
    val mixed = Seq(0L, 3600L, 7200L, 10800L) ++ (1 to 7).map(i => 10800L + i * 86400L)
    assert(!subdaily(mixed))
  }
}
