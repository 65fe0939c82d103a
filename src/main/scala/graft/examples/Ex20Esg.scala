package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** ESG / sustainability scores (reference: borsa/examples/20_esg.rs) —
  * the reference prints E/S/G options and degrades gracefully when the
  * provider dropped the capability; the router surfaces that as a typed
  * error rather than a crash.
  */
object Ex20Esg extends Example {
  val name = "20 esg"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    g.esg(aapl) match {
      case Right(scores) =>
        def f(v: Option[BigDecimal]) = v.map(_.toString).getOrElse("n/a")
        Seq(s"E: ${f(scores.environmental)}, S: ${f(scores.social)}, G: ${f(scores.governance)}")
      case Left(e) => Seq(s"ESG not available: $e")
    }
  }
}
