package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.OptionStream._

/** Typed option-stream data plane: ST9 keyed by underlying, ST8 keyed by
  * contract, streaming == batch replay.
  */
class OptionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def u(c: String, und: String, ts: Long, arr: Long, last: Double) =
    OptionUpdate(c, und, ts, arr, None, None, Some(BigDecimal(last)), None)

  private val updates = Seq(
    u("AAPL240119C150", "AAPL", 10, 1, 1.0),
    u("AAPL240119C150", "AAPL", 12, 2, 1.1),
    u("AAPL240119C150", "AAPL", 11, 3, 1.2), // ts regression for this contract → dropped
    u("AAPL240119P150", "AAPL", 11, 4, 2.0), // independent clock per contract
    u("MSFT240119C400", "MSFT", 5, 5, 3.0))

  test("allow-filter keys on underlying; gate keys on contract (independent clocks)") {
    val allowed = allowUnderlyings(updates.toDF(), Set("AAPL"))
    assert(allowed.count() == 4)
    val gated = batchReplay(allowed)
    val kept = gated.select("contractSymbol", "arrival").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // the P150 contract's ts=11 survives even though C150 already saw ts=12
    assert(kept == Set(("AAPL240119C150", 1L), ("AAPL240119C150", 2L), ("AAPL240119P150", 4L)))
  }

  test("streaming gate agrees with batch replay over the same arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[OptionUpdate]
    val gated = streamingGate(input.toDS(), stateTtlMs = 0)
    val query = gated.writeStream.format("memory").queryName("opt_gate")
      .outputMode("append").start()
    try {
      input.addData(updates)
      query.processAllAvailable()
      val streamed = spark.table("opt_gate").as[OptionUpdate].collect()
        .map(o => (o.contractSymbol, o.arrival)).toSet
      val batch = batchReplay(updates.toDF()).collect()
        .map(r => (r.getAs[String]("contractSymbol"), r.getAs[Long]("arrival"))).toSet
      assert(streamed == batch)
      assert(streamed.contains(("MSFT240119C400", 5L)))
    } finally query.stop()
  }
}
