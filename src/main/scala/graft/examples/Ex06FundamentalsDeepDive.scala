package graft.examples

import java.time.{Instant, ZoneOffset}

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.core.Payloads.StatementRow

/** Fundamentals deep dive (reference:
  * borsa/examples/06_fundamentals_deep_dive.rs) — earnings, calendar, and
  * all three statements in BOTH annual and quarterly form, fetched
  * concurrently (the reference's `tokio::join!` of 8 capability calls;
  * here 8 Futures joined the same way), then formatted section by section
  * with per-capability graceful degradation. Ex07 composes a subset of
  * these into one snapshot; this example is the full 8-call fan-out with
  * quarterly EPS actual-vs-estimate and calendar dates.
  */
object Ex06FundamentalsDeepDive extends Example {
  val name = "06 fundamentals deep dive"

  private def fmtDate(ts: Option[Long]) = ts
    .map(t => Instant.ofEpochSecond(t).atZone(ZoneOffset.UTC).toLocalDate.toString)
    .getOrElse("<none>")

  private def latest(rows: Seq[StatementRow]): String =
    rows.headOption.map { r =>
      val byItem = rows.filter(_.period == r.period)
        .map(x => s"${x.item}=${x.value.getOrElse("?")}").mkString(", ")
      s"latest ${r.period}: $byItem"
    }.getOrElse("<none>")

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    implicit val ec: ExecutionContext = ExecutionContext.global

    // the reference tokio::join!s all 8 fetches; each keeps its own Either
    // so one failing capability degrades only its section
    val fEarnings = Future(g.earnings(aapl))
    val fCalendar = Future(g.calendar(aapl))
    val fIncA = Future(g.incomeStatement(aapl))
    val fIncQ = Future(g.incomeStatement(aapl, quarterly = true))
    val fBalA = Future(g.balanceSheet(aapl))
    val fBalQ = Future(g.balanceSheet(aapl, quarterly = true))
    val fCfA = Future(g.cashflow(aapl))
    val fCfQ = Future(g.cashflow(aapl, quarterly = true))
    def get[A](f: Future[A]): A = Await.result(f, Duration.Inf)
    def section(a: Either[_, Seq[StatementRow]], q: Either[_, Seq[StatementRow]]) = Seq(
      a.fold(e => s"(annual unavailable: $e)", r => "Annual " + latest(r)),
      q.fold(e => s"(quarterly unavailable: $e)", r => "Quarterly " + latest(r)))

    Seq(s"Fundamentals Deep Dive for ${aapl.symbol.value}", "## Earnings") ++
      get(fEarnings).fold(e => Seq(s"(earnings unavailable: $e)"), e =>
        e.yearly.lastOption.map(y =>
          s"Latest Annual (${y.year}): revenue=${y.revenue.getOrElse("?")}, " +
            s"earnings=${y.earnings.getOrElse("?")}").toSeq ++
          e.quarterlyEps.reverse.take(4).map(q =>
            s" - ${q.period}: ${q.epsActual.getOrElse("<none>")} vs ${q.epsEstimate.getOrElse("<none>")}")) ++
      Seq("## Income Statement") ++ section(get(fIncA), get(fIncQ)) ++
      Seq("## Balance Sheet") ++ section(get(fBalA), get(fBalQ)) ++
      Seq("## Cash Flow") ++ section(get(fCfA), get(fCfQ)) ++
      Seq("## Calendar") ++
      get(fCalendar).fold(e => Seq(s"(calendar unavailable: $e)"), c => Seq(
        s"Next Earnings: ${fmtDate(c.earningsDates.headOption)}",
        s"Ex-Dividend: ${fmtDate(c.exDividendTs)}",
        s"Dividend Pay: ${fmtDate(c.dividendTs)}"))
  }
}
