package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Bulk download (reference: borsa/examples/21_download_builder.rs): one
  * request, many instruments, per-symbol results in a single data plane.
  * A failing instrument becomes a WARNING on the report — the rest of the
  * batch still succeeds (H8 partial-success semantics).
  */
object Ex21Download extends Example {
  val name = "21 bulk download"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val instruments = Seq("AAPL", "MSFT", "FAIL")
      .map(s => Instrument(Symbol(s), None, AssetKind.Equity))
    val start = 1704067200L
    val req = HistoryRequest(Interval.D1, Some(start), Some(start + 5 * 86400), None)

    g.download(instruments, req) match {
      case Right(d) =>
        val counts = d.candles.groupBy("symbol").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
        counts.map { case (sym, n) => s"$sym: $n candles" } ++
          Seq(s"warnings: ${d.warnings.size}") ++
          d.warnings.map(w => s" - $w")
      case Left(e) => Seq(s"download failed: $e")
    }
  }
}
