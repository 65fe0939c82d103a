package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.routing.Policy

/** History from two providers, merged by priority, with attribution
  * (reference: borsa/examples/02_history_merge.rs — "prefer our mock
  * connector for history data" + `history_with_attribution`).
  *
  * `prime` is the preferred provider but only covers the first 3 days
  * (a short feed); `backfill` covers everything. The first-wins merge (M1)
  * takes prime's candles where both overlap and backfills the rest; the
  * attribution spans (H6) show exactly which provider supplied which run of
  * timestamps.
  */
object Ex02HistoryMerge extends Example {
  val name = "02 history merge + attribution"

  def run(spark: SparkSession): Seq[String] = {
    val prime = new MockConnector("prime", MockConnector.Script(maxCandles = 3))
    val backfill = new MockConnector("backfill")
    val g = new Graft(spark, Seq(prime, backfill),
      Policy.ProviderPolicy().withGlobal(Seq("prime", "backfill")))

    val goog = Instrument(Symbol("GOOG"), None, AssetKind.Equity)
    val start = 1704067200L // 2024-01-01
    val req = HistoryRequest(Interval.D1, Some(start), Some(start + 10 * 86400), None)

    g.history(goog, req) match {
      case Right(h) =>
        val candles = h.candles.orderBy("ts").select("ts", "close").collect()
        val spans = h.attribution.collect()
        Seq(s"merged history: ${candles.length} candles") ++
          candles.take(5).map(r =>
            s" - ts ${r.getLong(0)}  close $$${r.getDecimal(1)}") ++
          Seq("attribution:") ++
          spans.map(r =>
            s" - '${r.getAs[String]("provider")}' supplied ts ${r.getAs[Long]("span_start")} " +
              s"to ${r.getAs[Long]("span_end")} (${r.getAs[Long]("n_points")} points)")
      case Left(e) => Seq(s"history failed: $e")
    }
  }
}
