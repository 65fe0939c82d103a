package graft.connector

import scala.collection.mutable

import graft.core.Errors.{BorsaError, normalizeRateLimit}
import graft.core.Model._

/** Middleware decorators MW1–MW6 (reference: borsa-middleware/src/
  * {cache.rs,quota.rs,blacklist.rs,builder.rs}). Connector-layer concerns —
  * they wrap provider IO, not the Spark plan.
  */
object Middleware {

  // ------------------------------------------------------------------ MW6

  /** Dynamic call-origin scope (borsa-core/src/middleware.rs:13-77 — the
    * reference's task-local `CallOrigin::scope`): orchestrator-internal
    * fan-out (e.g. `info`'s quote/profile/isin sub-calls) runs inside
    * [[internal]], and the quota/blacklist decorators consult the scoped
    * value PER CALL — so internal sub-requests never consume the user's
    * quota or trip the breaker, while the same stack instance (and its
    * cache) serves external calls normally. [[Fetch.withTimeout]]
    * re-establishes the scope across its worker-pool boundary.
    */
  val currentOrigin = new scala.util.DynamicVariable[CallOrigin](CallOrigin.External)

  def internal[T](parent: String, stage: String)(body: => T): T =
    currentOrigin.withValue(CallOrigin.Internal(parent, stage))(body)

  /** Per-call effective origin: a statically-internal stack stays internal;
    * otherwise the dynamic scope decides.
    */
  private def effectiveOrigin(ctx: CallContext): CallOrigin = ctx.origin match {
    case i: CallOrigin.Internal => i
    case CallOrigin.External    => currentOrigin.value
  }

  // ------------------------------------------------------------------ MW1

  final case class CacheConfig(
      capacityPerCapability: Int = 2000,
      defaultTtlMs: Long = 5 * 60 * 1000L,
      negativeTtlMs: Long = 60 * 1000L,
      // per-capability TTLs (borsa-types/src/config.rs:221-323)
      ttlMs: Map[String, Long] = Map(
        "quote" -> 2000L,
        "option-chain" -> 30000L,
        "news" -> 120000L,
        "history" -> 15 * 60 * 1000L,
        "download" -> 60 * 60 * 1000L,
        "search" -> 6 * 3600 * 1000L,
        "profile" -> 24 * 3600 * 1000L,
        "isin" -> 7 * 24 * 3600 * 1000L))

  /** TTL+LRU cache with negative caching of PERMANENT errors
    * (cache.rs:443-505: only permanent failures are cached, with their own
    * shorter TTL; transient errors always retry).
    */
  final class TtlLruCache[K, V](capacity: Int, clock: Clock) {
    private case class Entry(value: V, expiresAt: Long)
    private val map = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean =
        size() > capacity
    }
    def get(key: K): Option[V] = synchronized {
      Option(map.get(key)) match {
        case Some(e) if e.expiresAt > clock.nowMs => Some(e.value)
        case Some(_)                              => map.remove(key); None
        case None                                 => None
      }
    }
    def put(key: K, value: V, ttlMs: Long): Unit = synchronized {
      map.put(key, Entry(value, clock.nowMs + ttlMs))
    }
    def size: Int = synchronized(map.size())
  }

  final class CachingConnector(
      val inner: Connector,
      config: CacheConfig = CacheConfig(),
      clock: Clock = SystemClock) extends WrappedConnector {

    private val caches = mutable.Map.empty[String, TtlLruCache[Any, Either[BorsaError, Any]]]
    private def cacheFor(cap: String) = synchronized {
      caches.getOrElseUpdate(cap, new TtlLruCache(config.capacityPerCapability, clock))
    }

    protected def wrap[V](cap: String, key: Any)(load: => Either[BorsaError, V]): Either[BorsaError, V] = {
      val c = cacheFor(cap)
      c.get(key) match {
        case Some(hit) => hit.asInstanceOf[Either[BorsaError, V]]
        case None =>
          val result = load
          result match {
            case Right(_) =>
              c.put(key, result.asInstanceOf[Either[BorsaError, Any]],
                config.ttlMs.getOrElse(cap, config.defaultTtlMs))
            case Left(e) if e.isPermanent => // negative caching, own TTL
              c.put(key, result.asInstanceOf[Either[BorsaError, Any]], config.negativeTtlMs)
            case Left(_) => () // transient: never cached
          }
          result
      }
    }
  }

  // ------------------------------------------------------------------ MW2

  sealed trait QuotaStrategy
  object QuotaStrategy {
    case object Unit extends QuotaStrategy
    /** Caller-specified units per request (provider-specific call costs —
      * config.rs:54-57); the gate's `shouldAllow(weight)` deducts them.
      */
    case object Weighted extends QuotaStrategy
    case object EvenSpreadHourly extends QuotaStrategy
  }

  final case class QuotaConfig(
      limit: Long = 1000L,
      windowMs: Long = 60 * 1000L,
      strategy: QuotaStrategy = QuotaStrategy.Unit,
      // per-capability call costs, consulted under Weighted (unlisted
      // capabilities cost 1)
      capabilityWeights: Map[String, Long] = Map.empty)

  /** Sliding-window quota with boundary-aligned resets and the
    * EvenSpreadHourly slice policy (quota.rs:105-210): window split into 24
    * slices; slice exhaustion with window headroom → temporary
    * QuotaExceeded with remaining>0. Internal-origin calls bypass
    * (quota.rs:296-316).
    */
  final class QuotaGate(config: QuotaConfig, clock: Clock = SystemClock) {
    private val slices = 24L
    private val perSlice = math.max(1L, config.limit / slices)
    private val sliceMs = math.max(1L, config.windowMs / slices)

    private var windowStart = clock.nowMs
    private var inWindow = 0L
    private var sliceStart = clock.nowMs
    private var inSlice = 0L

    def shouldAllow(weight: Long = 1L): Either[BorsaError, Unit] = synchronized {
      // weights only apply under the Weighted strategy (quota.rs config
      // semantics: Unit always deducts exactly one)
      val cost = if (config.strategy == QuotaStrategy.Weighted) math.max(1L, weight) else 1L
      val now = clock.nowMs
      val elapsed = now - windowStart
      if (elapsed >= config.windowMs) {
        inWindow = 0
        windowStart += (elapsed / config.windowMs) * config.windowMs // boundary-aligned
      }
      if (config.strategy == QuotaStrategy.EvenSpreadHourly) {
        val se = now - sliceStart
        if (se >= sliceMs) {
          inSlice = 0
          sliceStart += (se / sliceMs) * sliceMs
        }
        if (inSlice >= perSlice && inWindow < config.limit) {
          val resetIn = sliceMs - (now - sliceStart)
          return Left(BorsaError.QuotaExceeded(config.limit - inWindow, resetIn))
        }
      }
      if (inWindow + cost <= config.limit) {
        inWindow += cost
        if (config.strategy == QuotaStrategy.EvenSpreadHourly) inSlice += 1
        Right(())
      } else {
        Left(BorsaError.QuotaExceeded(config.limit - inWindow,
          config.windowMs - (now - windowStart)))
      }
    }
  }

  final class QuotaAwareConnector(
      val inner: Connector,
      config: QuotaConfig = QuotaConfig(),
      clock: Clock = SystemClock,
      ctx: CallContext = CallContext()) extends WrappedConnector {
    val gate = new QuotaGate(config, clock)

    protected def wrap[V](cap: String, key: Any)(load: => Either[BorsaError, V]): Either[BorsaError, V] =
      effectiveOrigin(ctx) match {
        case CallOrigin.Internal(_, _) => load.left.map(normalizeRateLimit) // MW6 bypass
        case CallOrigin.External =>
          gate.shouldAllow(config.capabilityWeights.getOrElse(cap, 1L)) match {
            case Left(e)  => Left(e)
            case Right(_) => load.left.map(normalizeRateLimit) // MW4 normalization
          }
      }
  }

  // ------------------------------------------------------------------ MW3

  final case class BlacklistConfig(defaultWindowMs: Long = 60 * 1000L)

  /** Circuit breaker: a RateLimitExceeded response blacklists the provider
    * until now + (provider window | default); pre-call rejects with
    * TemporarilyBlacklisted{reset_in_ms} (blacklist.rs:42-90,146-170).
    */
  final class BlacklistConnector(
      val inner: Connector,
      config: BlacklistConfig = BlacklistConfig(),
      clock: Clock = SystemClock,
      ctx: CallContext = CallContext()) extends WrappedConnector {

    @volatile private var blacklistedUntil: Long = 0L

    protected def wrap[V](cap: String, key: Any)(load: => Either[BorsaError, V]): Either[BorsaError, V] =
      effectiveOrigin(ctx) match {
        case CallOrigin.Internal(_, _) => load
        case CallOrigin.External =>
          val now = clock.nowMs
          if (now < blacklistedUntil)
            Left(BorsaError.TemporarilyBlacklisted(blacklistedUntil - now))
          else load match {
            case l @ Left(e) =>
              e.flatten.collectFirst {
                case BorsaError.RateLimitExceeded(_, windowMs) => windowMs
                case BorsaError.Connector(_, BorsaError.RateLimitExceeded(_, w)) => w
              }.foreach { w =>
                blacklistedUntil = now + (if (w > 0) w else config.defaultWindowMs)
              }
              l
            case r => r
          }
      }
  }

  // ------------------------------------------------------------------ MW5

  /** Onion composition with enforced outermost-first order
    * Cache → Blacklist → Quota (builder.rs:73-84): the cache must sit outside
    * so cached hits cost no quota; the blacklist outside the quota so
    * blacklisted calls don't consume budget.
    */
  def buildStack(
      base: Connector,
      cache: Option[CacheConfig] = Some(CacheConfig()),
      blacklist: Option[BlacklistConfig] = Some(BlacklistConfig()),
      quota: Option[QuotaConfig] = Some(QuotaConfig()),
      clock: Clock = SystemClock,
      ctx: CallContext = CallContext()): Either[BorsaError, Connector] = {
    var c: Connector = base
    quota.foreach(q => c = new QuotaAwareConnector(c, q, clock, ctx))
    blacklist.foreach(b => c = new BlacklistConnector(c, b, clock, ctx))
    cache.foreach(cc => c = new CachingConnector(c, cc, clock))
    Right(c)
  }

  /** Stack-order validation for manually assembled stacks (MW5). */
  def validateStack(stack: Connector): Either[BorsaError, Unit] = {
    def layers(c: Connector): List[String] = c match {
      case w: CachingConnector    => "cache" :: layers(w.inner)
      case w: BlacklistConnector  => "blacklist" :: layers(w.inner)
      case w: QuotaAwareConnector => "quota" :: layers(w.inner)
      case _                      => Nil
    }
    val order = layers(stack)
    val expected = List("cache", "blacklist", "quota").filter(order.contains)
    if (order == expected) Right(())
    else Left(BorsaError.InvalidMiddlewareStack(
      s"middleware order must be cache→blacklist→quota, got ${order.mkString("→")}"))
  }
}
