package graft.router

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future, Promise}
import scala.util.{Failure, Success}

import graft.core.Errors
import graft.core.Errors.BorsaError

/** Fetch strategies F3/F4 (reference: borsa/src/core.rs:459-616) — pure
  * driver-side control flow around provider calls. The Spark data plane is
  * never involved: these orchestrate small record-level IO.
  */
object Fetch {

  sealed trait Strategy
  object Strategy {
    /** Iterate providers in priority order; first success wins; NotFound
      * continues; per-call timeout.
      */
    case object PriorityWithFallback extends Strategy
    /** Launch all providers concurrently; first success wins. */
    case object Latency extends Strategy
  }

  final case class Config(
      strategy: Strategy = Strategy.PriorityWithFallback,
      providerTimeout: FiniteDuration = 5.seconds, // config.rs:161 default
      requestTimeout: Option[FiniteDuration] = None)

  private lazy val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-fetch"); t.setDaemon(true); t
  })
  private lazy val ec = ExecutionContext.fromExecutor(pool)

  /** Run one provider call under the per-provider timeout. A connector that
    * THROWS (rather than returning Left) must not abort the fallback chain
    * or vanish from a race's error set (the reference wraps every provider
    * call result, core.rs:459-616) — any non-fatal throwable becomes a
    * tagged Connector error so collapse semantics see it.
    */
  def withTimeout[A](
      provider: String,
      capability: String,
      timeout: FiniteDuration)(call: => Either[BorsaError, A]): Either[BorsaError, A] = {
    // MW6: the dynamic call-origin scope is thread-local — capture it at
    // submission and re-establish it on the pool thread so internal
    // fan-out stays internal through the fetch layer
    val origin = graft.connector.Middleware.currentOrigin.value
    val fut = Future(
      graft.connector.Middleware.currentOrigin.withValue(origin)(call))(ec)
    try Await.result(fut, timeout)
    catch {
      case _: TimeoutException => Left(BorsaError.ProviderTimeout(provider, capability))
      case scala.util.control.NonFatal(t) =>
        Left(BorsaError.Connector(provider,
          BorsaError.Other(s"${t.getClass.getSimpleName}: ${t.getMessage}")))
    }
  }

  /** F3 PriorityWithFallback (core.rs:499-550). `postOk` can demote a
    * success to an error (F6 enforce_quote_exchange, core.rs:276-296) which
    * then continues the fallback chain.
    */
  def prioritySequential[A](
      providers: Seq[(String, () => Either[BorsaError, A])],
      capability: String,
      config: Config = Config(),
      notFoundWhat: Option[String] = None,
      postOk: A => Either[BorsaError, A] = (a: A) => Right(a)): Either[BorsaError, A] = {
    val deadline = config.requestTimeout.map(t => System.nanoTime() + t.toNanos)
    val errors = Seq.newBuilder[BorsaError]
    providers.foreach { case (name, call) =>
      deadline.foreach { d =>
        if (System.nanoTime() >= d) return Left(BorsaError.RequestTimeout(capability))
      }
      withTimeout(name, capability, config.providerTimeout)(call()).flatMap(postOk) match {
        case Right(a) => return Right(a)
        case Left(e)  => errors += tag(name, e)
      }
    }
    Left(Errors.collapse(errors.result(), capability, notFoundWhat))
  }

  /** F4 Latency race (core.rs:560-616): all providers launched concurrently,
    * first success wins; stragglers bounded by the provider timeout.
    */
  def latencyRace[A](
      providers: Seq[(String, () => Either[BorsaError, A])],
      capability: String,
      config: Config = Config(),
      notFoundWhat: Option[String] = None,
      postOk: A => Either[BorsaError, A] = (a: A) => Right(a)): Either[BorsaError, A] = {
    if (providers.isEmpty) return Left(BorsaError.Unsupported(capability))
    val winner = Promise[A]()
    val remaining = new java.util.concurrent.atomic.AtomicInteger(providers.size)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[BorsaError]()
    val origin = graft.connector.Middleware.currentOrigin.value // MW6 scope capture
    providers.foreach { case (name, call) =>
      Future {
        graft.connector.Middleware.currentOrigin.withValue(origin) {
          withTimeout(name, capability, config.providerTimeout)(call()).flatMap(postOk)
        } match {
          case Right(a) => winner.trySuccess(a)
          case Left(e)  => errors.add(tag(name, e))
        }
      }(ec).onComplete {
        case _ =>
          if (remaining.decrementAndGet() == 0 && !winner.isCompleted) {
            import scala.jdk.CollectionConverters._
            winner.tryFailure(CollapsedException(
              Errors.collapse(errors.asScala.toSeq, capability, notFoundWhat)))
          }
      }(ec)
    }
    val overall = config.requestTimeout.getOrElse(config.providerTimeout + 1.second)
    try Right(Await.result(winner.future, overall))
    catch {
      case CollapsedException(e)  => Left(e)
      case _: TimeoutException    => Left(BorsaError.RequestTimeout(capability))
    }
  }

  private final case class CollapsedException(error: BorsaError) extends RuntimeException

  /** Wrap provider errors with the connector name unless already tagged
    * (core.rs error labeling).
    */
  private def tag(name: String, e: BorsaError): BorsaError = e match {
    case c: BorsaError.Connector       => c
    case t: BorsaError.ProviderTimeout => t
    case nf: BorsaError.NotFound       => nf
    case other                         => BorsaError.Connector(name, other)
  }
}
