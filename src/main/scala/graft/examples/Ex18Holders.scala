package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.core.Payloads.HolderKind

/** Ownership tables across all six holder kinds (reference:
  * borsa/examples/18_holders.rs — the same capability router serves
  * major / institutional / mutual-fund / insider variants).
  */
object Ex18Holders extends Example {
  val name = "18 holders"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    HolderKind.all.flatMap { kind =>
      g.holders(aapl, kind) match {
        case Right(rows) =>
          s"${kind.id}: ${rows.size} rows" +:
            rows.take(1).map(r => s"  - ${r.holder} shares=${r.shares.getOrElse(0L)}" +
              r.transaction.map(t => s" txn=$t").getOrElse(""))
        case Left(e) => Seq(s"${kind.id} failed: $e")
      }
    }
  }
}
