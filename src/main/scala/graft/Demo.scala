package graft

import org.apache.spark.sql.SparkSession

import graft.connector.MockConnector
import graft.core.Model._
import graft.routing.Policy
import graft.tables.Tables

/** Runnable tour of the API surface (the reference ships 24 runnable
  * examples against its mock; this is the equivalent quick-start —
  * everything below runs offline against the deterministic mock +
  * the driver test tables).
  *
  *   sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = new Graft(spark,
      Seq(new MockConnector("alpha"), new MockConnector("beta")),
      Policy.ProviderPolicy().withGlobal(Seq("alpha", "beta")))
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)

    println("== quote ==")
    println(g.quote(aapl))

    println("== fast info ==")
    println(g.fastInfo(aapl))

    println("== info (composed with warnings) ==")
    println(g.info(aapl).map(_.payload))

    println("== search (deduped, limited) ==")
    println(g.search("ZZ", limit = Some(3)).map(_.payload))

    println("== history: priority merge + attribution ==")
    val req = HistoryRequest(Interval.D1, Some(1704067200L), Some(1704067200L + 5 * 86400), None)
    g.history(aapl, req).foreach { h =>
      h.candles.orderBy("ts").show(5, truncate = false)
      h.attribution.show(truncate = false)
    }

    println("== download: two symbols, one plan ==")
    g.download(Seq(aapl, Instrument(Symbol("MSFT"), None, AssetKind.Equity)), req)
      .foreach(_.candles.groupBy("symbol").count().show())

    println("== training-data ops over the documents table ==")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    pipeline.TextAnalysis.tokenStats(docs).show(3)
    pipeline.Dedup.simhash(docs).show(3)
    println(s"minhash near-dups on clean corpus: ${pipeline.Dedup.minhashNearDups(docs).count()}")

    spark.stop()
  }
}
