package graft.core

/** Error ADT (reference: borsa-types/src/error.rs:12-224) with the pure
  * classification/aggregation functions the router depends on:
  * retryClass, isActionable, flatten, and the F5/ST11 collapse rules.
  */
object Errors {

  sealed trait RetryClass
  object RetryClass {
    case object Permanent extends RetryClass
    case object Transient extends RetryClass
    case object Unknown extends RetryClass
  }

  sealed trait BorsaError {
    import BorsaError._

    /** error.rs:156-166: capability absence / benign not-found are not
      * actionable; aggregates classified by contents.
      */
    def isActionable: Boolean = this match {
      case _: Unsupported | _: NotFound => false
      case AllProvidersFailed(inner)    => inner.exists(_.isActionable)
      case _                            => true
    }

    /** error.rs:168-181: unwrap nested aggregates recursively. */
    def flatten: List[BorsaError] = this match {
      case AllProvidersFailed(inner) => inner.flatMap(_.flatten).toList
      case other                     => List(other)
    }

    /** error.rs:184-224 tri-state retry classification. */
    def retryClass: RetryClass = this match {
      case _: Unsupported | _: NotFound | _: StrictSymbolsRejected | _: InvalidArg |
          _: InvalidMiddlewareStack | InconsistentCurrencyData =>
        RetryClass.Permanent
      case _: ProviderTimeout | _: RequestTimeout | _: AllProvidersTimedOut |
          _: QuotaExceeded | _: RateLimitExceeded | _: TemporarilyBlacklisted =>
        RetryClass.Transient
      case AllProvidersFailed(inner) =>
        if (inner.exists(_.retryClass == RetryClass.Permanent)) RetryClass.Permanent
        else if (inner.nonEmpty && inner.forall(_.retryClass == RetryClass.Transient)) RetryClass.Transient
        else RetryClass.Unknown
      case Connector(_, inner) => inner.retryClass
      case _                   => RetryClass.Unknown
    }

    def isPermanent: Boolean = retryClass == RetryClass.Permanent
    def isTransient: Boolean = retryClass == RetryClass.Transient
  }

  object BorsaError {
    final case class Unsupported(capability: String) extends BorsaError
    final case class Data(message: String) extends BorsaError
    final case class InvalidArg(message: String) extends BorsaError
    final case class Connector(connector: String, error: BorsaError) extends BorsaError
    case object InconsistentCurrencyData extends BorsaError
    final case class Other(message: String) extends BorsaError
    final case class NotFound(what: String) extends BorsaError
    final case class AllProvidersFailed(errors: Seq[BorsaError]) extends BorsaError
    final case class ProviderTimeout(connector: String, capability: String) extends BorsaError
    final case class RequestTimeout(capability: String) extends BorsaError
    final case class AllProvidersTimedOut(capability: String) extends BorsaError
    final case class StrictSymbolsRejected(rejected: Seq[String]) extends BorsaError
    final case class QuotaExceeded(remaining: Long, resetInMs: Long) extends BorsaError
    final case class RateLimitExceeded(limit: Long, windowMs: Long) extends BorsaError
    final case class TemporarilyBlacklisted(resetInMs: Long) extends BorsaError
    final case class InvalidMiddlewareStack(message: String) extends BorsaError
  }

  import BorsaError._

  /** F5 `collapse_errors` (borsa/src/router/util.rs:31-58): no attempts →
    * Unsupported; all timeouts → AllProvidersTimedOut; all labeled NotFound →
    * NotFound; otherwise AllProvidersFailed.
    */
  def collapse(errors: Seq[BorsaError], capability: String, notFoundWhat: Option[String]): BorsaError =
    if (errors.isEmpty) Unsupported(capability)
    else if (errors.forall {
      case _: ProviderTimeout => true
      case Connector(_, _: ProviderTimeout) => true
      case _ => false
    }) AllProvidersTimedOut(capability)
    else notFoundWhat match {
      case Some(what) if errors.forall {
        case _: NotFound => true
        case Connector(_, _: NotFound) => true
        case _ => false
      } => NotFound(what)
      case _ => AllProvidersFailed(errors)
    }

  /** ST11 `collapse_stream_errors` (borsa/src/router/streaming/error.rs:3-14):
    * flatten, keep actionable; 0 → Unsupported, 1 → itself, n → aggregate.
    */
  def collapseStream(errors: Seq[BorsaError], capability: String): BorsaError = {
    val actionable = errors.flatMap(_.flatten).filter(_.isActionable)
    actionable match {
      case Seq()  => Unsupported(capability)
      case Seq(e) => e
      case many   => AllProvidersFailed(many)
    }
  }

  /** MW4 rate-limit heuristic (borsa-middleware/src/quota.rs:211-227,
    * README:186-189): provider messages mentioning 429 / rate limiting are
    * normalized to RateLimitExceeded.
    */
  def normalizeRateLimit(e: BorsaError): BorsaError = {
    def looksRateLimited(msg: String): Boolean = {
      val m = msg.toLowerCase
      m.contains("429") || m.contains("rate limit") || m.contains("too many requests")
    }
    e match {
      case Data(m) if looksRateLimited(m)  => RateLimitExceeded(0, 0)
      case Other(m) if looksRateLimited(m) => RateLimitExceeded(0, 0)
      case Connector(name, inner)          => Connector(name, normalizeRateLimit(inner))
      case other                           => other
    }
  }
}
