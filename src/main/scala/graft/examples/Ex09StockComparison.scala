package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Compare performance across symbols (reference:
  * borsa/examples/09_stock_comparison.rs — fetch the same range for several
  * instruments and compare percent change). One bulk download, one
  * DataFrame: per symbol, pct change = (last close - first close) / first.
  */
object Ex09StockComparison extends Example {
  val name = "09 stock comparison"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val instruments = Seq("AAPL", "MSFT", "GOOG")
      .map(s => Instrument(Symbol(s), None, AssetKind.Equity))
    val start = 1704067200L
    val req = HistoryRequest(Interval.D1, Some(start), Some(start + 30 * 86400), None)

    g.download(instruments, req) match {
      case Right(d) =>
        val perf = d.candles.groupBy("symbol").agg(
            min_by(col("close"), col("ts")).as("first_close"),
            max_by(col("close"), col("ts")).as("last_close"))
          .withColumn("pct_change_bp",
            ((col("last_close") - col("first_close")) * 10000 / col("first_close"))
              .cast("long"))
          .orderBy(col("pct_change_bp").desc)
          .collect()
        s"30-day performance (${perf.length} symbols):" +:
          perf.map(r => f"  ${r.getString(0)}%-6s ${r.getDecimal(1)}%-8s -> ${r.getDecimal(2)}%-8s (${r.getLong(3)} bp)").toSeq
      case Left(e) => Seq(s"download failed: $e")
    }
  }
}
