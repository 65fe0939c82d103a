package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.connector.{MockConnector, Middleware}
import graft.core.Errors.BorsaError
import graft.core.Model._

/** Quota middleware (reference: borsa/examples/24_quota_middleware.rs —
  * wrap a connector in a quota-aware layer). Here the budget is 2 calls per
  * window: the first two quotes consume it, the third is rejected with
  * `QuotaExceeded` BEFORE reaching the provider. Distinct symbols are used
  * so the cache layer (which would happily serve a repeat symbol without
  * consuming quota) stays out of the way.
  */
object Ex24QuotaMiddleware extends Example {
  val name = "24 quota middleware"

  def run(spark: SparkSession): Seq[String] = {
    val g = new Graft(spark, Seq(new MockConnector("mock")),
      middlewareConfig = Graft.MiddlewareConfig(
        quota = Some(Middleware.QuotaConfig(limit = 2, windowMs = 3600 * 1000L))))

    Seq("AAPL", "MSFT", "GOOG").map { sym =>
      g.quote(Instrument(Symbol(sym), None, AssetKind.Equity)) match {
        case Right(q) => s"$sym -> ok (price ${q.price.getOrElse("?")})"
        case Left(e) =>
          // a single-provider failure arrives collapsed (F5) — flatten to
          // find the quota rejection inside
          e.flatten.collectFirst {
            case BorsaError.QuotaExceeded(remaining, _) =>
              s"$sym -> quota exceeded (remaining $remaining)"
            case BorsaError.Connector(_, BorsaError.QuotaExceeded(remaining, _)) =>
              s"$sym -> quota exceeded (remaining $remaining)"
          }.getOrElse(s"$sym -> $e")
      }
    }
  }
}
