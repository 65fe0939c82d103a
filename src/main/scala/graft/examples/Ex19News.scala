package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Model._
import graft.core.Payloads.NewsRequest

/** News headlines (reference: borsa/examples/19_news.rs) — request up to
  * 10 articles, print the first 5 as "title — publisher".
  */
object Ex19News extends Example {
  val name = "19 news"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    g.news(aapl, NewsRequest(limit = 10)) match {
      case Right(articles) =>
        Seq(s"articles: ${articles.size}") ++
          articles.take(5).map(a => s"${a.title} — ${a.publisher.getOrElse("")}")
      case Left(e) => Seq(s"news failed: $e")
    }
  }
}
