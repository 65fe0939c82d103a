package graft.examples

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.MockConnector
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.router.Fetch
import graft.routing.Policy

/** Fetch strategies (reference: borsa/examples/13_fetch_strategies.rs):
  * sequential PriorityWithFallback vs the Latency race, plus the
  * per-provider timeout.
  *
  *  - fallback: the primary fails, the secondary answers — the call still
  *    succeeds;
  *  - latency: both providers fire concurrently, first success wins — a
  *    slow primary doesn't delay the answer;
  *  - timeout: a provider slower than `providerTimeout` is cut off and the
  *    chain moves on.
  */
object Ex13FetchStrategies extends Example {
  val name = "13 fetch strategies"

  def run(spark: SparkSession): Seq[String] = {
    val policy = Policy.ProviderPolicy().withGlobal(Seq("primary", "secondary"))
    def show(label: String, result: Either[BorsaError, Quote]): String = result match {
      case Right(q) => s"$label -> quote from venue ${q.exchange.getOrElse("?")}"
      case Left(e)  => s"$label -> failed: $e"
    }
    val aapl = Instrument(Symbol("AAPL"), None, AssetKind.Equity)
    def venue(code: String) = Map("AAPL" -> code)

    // 1. PriorityWithFallback (default): broken primary → secondary serves
    val broken = new MockConnector("primary", MockConnector.Script(
      behaviors = Map("quote" -> MockConnector.Fail(
        BorsaError.Connector("primary", BorsaError.Other("primary down")))),
      exchanges = venue("PRIMARY")))
    val healthy = new MockConnector("secondary",
      MockConnector.Script(exchanges = venue("SECONDARY")))
    val fallback = new Graft(spark, Seq(broken, healthy), policy)

    // 2. Latency race: slow primary + fast secondary, first success wins
    val slow = new MockConnector("primary", MockConnector.Script(
      behaviors = Map("quote" -> MockConnector.Delay(500)),
      exchanges = venue("PRIMARY")))
    val racer = new Graft(spark, Seq(slow, healthy), policy,
      fetchConfig = Fetch.Config(strategy = Fetch.Strategy.Latency))

    // 3. Tight per-provider timeout: the slow primary is cut off mid-call
    val impatient = new Graft(spark, Seq(slow, healthy), policy,
      fetchConfig = Fetch.Config(providerTimeout = 100.millis))

    Seq(
      show("fallback (primary down)  ", fallback.quote(aapl)),
      show("latency race (slow prim.)", racer.quote(aapl)),
      show("100ms provider timeout   ", impatient.quote(aapl)))
  }
}
