package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Analyst price target (reference: borsa/examples/04_price_target.rs) —
  * low/mean/high plus analyst count, printed only when the payload is
  * complete, mirroring the reference's `if let (Some, Some, Some, Some)`.
  */
object Ex04PriceTarget extends Example {
  val name = "04 price target"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val nvda = Instrument(Symbol("NVDA"), None, AssetKind.Equity)
    g.priceTarget(nvda) match {
      case Right(t) =>
        Seq(s"## Analyst Price Target for ${nvda.symbol.value}") ++
          ((t.low, t.mean, t.high, t.analysts) match {
            case (Some(low), Some(mean), Some(high), Some(count)) =>
              Seq(
                s"- Based on $count analysts:",
                f"  - High:   $$$high%.2f",
                f"  - Mean:   $$$mean%.2f",
                f"  - Low:    $$$low%.2f")
            case _ => Seq("- No complete analyst price target data available.")
          })
      case Left(e) => Seq(s"price target failed: $e")
    }
  }
}
