package graft.router

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.connector.MockConnector
import graft.core.Model._
import graft.router.HistoryOrchestrator._
import graft.timeseries.Flags

/** Ports of the reference raw-close/keepna/prepost flag scenarios
  * (borsa/tests/router/history/router_history_raw_close.rs; flag
  * preservation through the per-provider rewrite history.rs:417-443).
  */
class RouterFlagsSpec extends SparkSpec {

  private val inst = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
  private val start = 1704067200L
  private val reqD1 = HistoryRequest(Interval.D1, Some(start), Some(start + 10 * 86400), None)

  test("raw close preserved for single source with no resample (raw_close.rs:10-62)") {
    val c = new MockConnector("single",
      MockConnector.Script(closeUnadjDelta = Some(BigDecimal(3))))
    val Right(res) = history(spark, inst, reqD1, Seq(c))
    val rows = res.candles.select("close_unadj").collect()
    assert(rows.length == 10)
    assert(rows.forall(!_.isNullAt(0)), "single-source unresampled close_unadj must survive")
  }

  test("raw close dropped when the provider plan resamples (raw_close.rs:64-124)") {
    val c = new MockConnector("single",
      MockConnector.Script(supportedIntervals = Seq(Interval.I1h),
        closeUnadjDelta = Some(BigDecimal(3))))
    val Right(res) = history(spark, inst, reqD1, Seq(c))
    assert(res.candles.select("close_unadj").collect().forall(_.isNullAt(0)))
  }

  test("autoAdjust=false selects the raw close per provider, before any resample") {
    val delta = BigDecimal(3)
    val c = new MockConnector("p",
      MockConnector.Script(closeUnadjDelta = Some(delta)))
    val Right(adj) = history(spark, inst, reqD1, Seq(c))
    val Right(raw) = history(spark, inst, reqD1.copy(autoAdjust = false), Seq(c))
    val adjClose = adj.candles.select("ts", "close").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val rawClose = raw.candles.select("ts", "close").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(adjClose.keySet == rawClose.keySet && adjClose.nonEmpty)
    adjClose.foreach { case (ts, cl) =>
      assert(cl - rawClose(ts) == delta, s"ts=$ts adjusted-raw should be $delta")
    }
  }

  private val naSchema = StructType(Seq(
    StructField("symbol", StringType), StructField("ts", LongType),
    StructField("open", DecimalType(18, 6)), StructField("high", DecimalType(18, 6)),
    StructField("low", DecimalType(18, 6)), StructField("close", DecimalType(18, 6)),
    StructField("is_regular", BooleanType)))

  private def naFrame() = {
    val rows = (0 until 6).map { i =>
      val v = if (i % 3 == 2) null else BigDecimal(100 + i).bigDecimal
      Row("S", start + i * 86400L, v, v, v, v, Boolean.box(i % 2 == 0))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), naSchema)
  }

  test("keepna=false drops null-valued rows; keepna=true retains them") {
    val df = naFrame().drop("is_regular") // isolate the NA filter
    assert(Flags.applyRequestFlags(df, reqD1).count() == 4) // default keepna=false, rows 2 and 5 are NA
    assert(Flags.applyRequestFlags(df, reqD1.copy(keepna = true)).count() == 6)
  }

  test("prepost=false drops session-marked pre/post rows; unmarked frames pass through") {
    val df = naFrame() // is_regular on even rows
    val regularOnly = Flags.applyRequestFlags(df, reqD1.copy(keepna = true, prepost = false))
    assert(regularOnly.count() == 3)
    val withPrePost = Flags.applyRequestFlags(df, reqD1.copy(keepna = true, prepost = true))
    assert(withPrePost.count() == 6)
    // unmarked frame: prepost=false is a no-op (session filtering is the
    // provider's job in the reference; the engine filters only when marked)
    val unmarked = df.drop("is_regular")
    assert(Flags.applyRequestFlags(unmarked, reqD1.copy(keepna = true)).count() == 6)
  }

  test("flags are preserved through the per-provider interval rewrite (history.rs:417-443)") {
    val c = new MockConnector("p")
    val flagged = reqD1.copy(prepost = true, actions = false, autoAdjust = false, keepna = true)
    val planned = planProviders(inst, flagged, Seq(c), graft.routing.Policy.ProviderPolicy())
    assert(planned.nonEmpty)
    planned.foreach { case (_, eff, _) =>
      assert(eff.prepost && !eff.actions && !eff.autoAdjust && eff.keepna)
    }
  }
}
