package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._

/** Upcoming calendar events (reference:
  * borsa/examples/11_upcoming_events.rs — earnings dates and dividend
  * timestamps off the calendar capability).
  */
object Ex11UpcomingEvents extends Example {
  val name = "11 upcoming events"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    g.calendar(Instrument(Symbol("AAPL"), None, AssetKind.Equity)) match {
      case Right(c) => Seq(
        s"earnings dates: ${c.earningsDates.mkString(", ")}",
        s"ex-dividend:    ${c.exDividendTs.getOrElse("n/a")}",
        s"dividend pay:   ${c.dividendTs.getOrElse("n/a")}")
      case Left(e) => Seq(s"calendar failed: $e")
    }
  }
}
