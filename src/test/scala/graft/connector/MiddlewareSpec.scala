package graft.connector

import org.scalatest.funsuite.AnyFunSuite

import graft.connector.Middleware._
import graft.core.Errors.BorsaError
import graft.core.Model._

class MiddlewareSpec extends AnyFunSuite {
  private val inst = Instrument(Symbol("AAPL"), None, AssetKind.Equity)

  private class CountingConnector extends Connector {
    var calls = 0
    def name = "counting"
    def capabilities = Set("quote")
    override def quote(i: Instrument): Either[BorsaError, Quote] = {
      calls += 1
      if (i.symbol.value == "NF") Left(BorsaError.NotFound("quote"))
      else if (i.symbol.value == "TRANSIENT") Left(BorsaError.ProviderTimeout(name, "quote"))
      else if (i.symbol.value == "RL") Left(BorsaError.RateLimitExceeded(0, 5000))
      else Right(Quote(i.symbol.value, Some(BigDecimal(1)), None, None, None, None, None, None))
    }
  }

  test("MW1 cache: TTL hit/expiry, per-capability TTLs (cache.rs:308-345)") {
    val clock = new ManualClock(0)
    val inner = new CountingConnector
    val c = new CachingConnector(inner, CacheConfig(), clock)
    assert(c.quote(inst).isRight); assert(inner.calls == 1)
    assert(c.quote(inst).isRight); assert(inner.calls == 1) // cached
    clock.advance(1999); c.quote(inst); assert(inner.calls == 1) // quote TTL 2s
    clock.advance(2); c.quote(inst); assert(inner.calls == 2) // expired
  }

  test("MW1 negative caching: permanent errors cached with own TTL, transient never (cache.rs:443-505)") {
    val clock = new ManualClock(0)
    val inner = new CountingConnector
    val c = new CachingConnector(inner, CacheConfig(), clock)
    val nf = Instrument(Symbol("NF"), None, AssetKind.Equity)
    c.quote(nf); c.quote(nf)
    assert(inner.calls == 1) // NotFound (permanent) cached
    clock.advance(60001)
    c.quote(nf); assert(inner.calls == 2) // negative TTL 60s expired
    val tr = Instrument(Symbol("TRANSIENT"), None, AssetKind.Equity)
    c.quote(tr); c.quote(tr)
    assert(inner.calls == 4) // transient retried every time
  }

  test("MW1 cache keys: full request identity separates entries — symbol, interval, and flag bits (cache_keys.rs)") {
    val clock = new ManualClock(0)
    var calls = 0
    val inner = new Connector {
      def name = "hist"
      def capabilities = Set("history")
      override def history(i: Instrument, r: HistoryRequest): Either[BorsaError, HistoryResponse] = {
        calls += 1
        Right(HistoryResponse(Seq.empty, Seq.empty, adjusted = true, meta = None))
      }
    }
    val c = new CachingConnector(inner, CacheConfig(), clock)
    val msft = Instrument(Symbol("MSFT"), None, AssetKind.Equity)
    val base = HistoryRequest(Interval.D1, Some(0L), Some(86400L), None)
    c.history(inst, base); c.history(inst, base)
    assert(calls == 1, "identical request must hit the cache")
    c.history(msft, base)
    assert(calls == 2, "different symbol is a different key")
    c.history(inst, base.copy(interval = Interval.I1h))
    assert(calls == 3, "different interval is a different key")
    c.history(inst, base.copy(keepna = !base.keepna))
    assert(calls == 4, "a flipped request flag is a different key")
    c.history(inst, base.copy(autoAdjust = !base.autoAdjust))
    assert(calls == 5, "autoAdjust is part of the identity")
    c.history(inst, base)
    assert(calls == 5, "the original entry is still live under its own key")
  }

  test("MW1 LRU eviction at capacity") {
    val clock = new ManualClock(0)
    val cache = new TtlLruCache[Int, Int](2, clock)
    cache.put(1, 1, 1000); cache.put(2, 2, 1000); cache.put(3, 3, 1000)
    assert(cache.get(1).isEmpty) // evicted
    assert(cache.get(2).contains(2) && cache.get(3).contains(3))
  }

  test("MW2 quota: window limit + boundary-aligned reset (quota.rs:105-210)") {
    val clock = new ManualClock(0)
    val gate = new QuotaGate(QuotaConfig(limit = 2, windowMs = 1000), clock)
    assert(gate.shouldAllow().isRight)
    assert(gate.shouldAllow().isRight)
    gate.shouldAllow() match {
      case Left(BorsaError.QuotaExceeded(remaining, resetMs)) =>
        assert(remaining == 0); assert(resetMs == 1000)
      case other => fail(s"expected QuotaExceeded, got $other")
    }
    clock.advance(2500) // 2.5 windows later: reset aligns to boundary at 2000
    assert(gate.shouldAllow().isRight)
  }

  test("MW2 EvenSpreadHourly: slice exhaustion blocks temporarily with remaining>0 (quota.rs:150-180)") {
    val clock = new ManualClock(0)
    // limit 48, window 24000ms -> 24 slices of 1000ms, 2 per slice
    val gate = new QuotaGate(QuotaConfig(48, 24000, QuotaStrategy.EvenSpreadHourly), clock)
    assert(gate.shouldAllow().isRight); assert(gate.shouldAllow().isRight)
    gate.shouldAllow() match {
      case Left(BorsaError.QuotaExceeded(remaining, resetMs)) =>
        assert(remaining == 46) // window still has room
        assert(resetMs == 1000)
      case other => fail(s"expected slice block, got $other")
    }
    clock.advance(1000) // next slice
    assert(gate.shouldAllow().isRight)
  }

  test("MW3 blacklist: rate-limit trips breaker; internal origin bypasses (blacklist.rs:42-90)") {
    val clock = new ManualClock(0)
    val inner = new CountingConnector
    val bl = new BlacklistConnector(inner, BlacklistConfig(), clock)
    val rl = Instrument(Symbol("RL"), None, AssetKind.Equity)
    bl.quote(rl) // trips: provider window 5000ms
    bl.quote(inst) match {
      case Left(BorsaError.TemporarilyBlacklisted(reset)) => assert(reset == 5000)
      case other => fail(s"expected blacklisted, got $other")
    }
    clock.advance(5000)
    assert(bl.quote(inst).isRight)
    // internal origin bypasses the breaker
    val inner2 = new CountingConnector
    val bl2 = new BlacklistConnector(inner2, BlacklistConfig(), clock,
      CallContext(CallOrigin.Internal("info", "quote")))
    bl2.quote(rl)
    assert(bl2.quote(inst).isRight)
  }

  test("MW2 Weighted: per-capability call costs deduct their weight (config.rs:54-57)") {
    val clock = new ManualClock(0)
    val inner = new CountingConnector
    val q = new QuotaAwareConnector(inner,
      QuotaConfig(limit = 10, windowMs = 3600000, strategy = QuotaStrategy.Weighted,
        capabilityWeights = Map("quote" -> 4L)), clock)
    assert(q.quote(inst).isRight) // 4
    assert(q.quote(inst).isRight) // 8
    q.quote(inst) match { // would need 12 > 10
      case Left(BorsaError.QuotaExceeded(remaining, _)) => assert(remaining == 2)
      case other => fail(s"expected weighted exhaustion with remaining=2, got $other")
    }
    // Unit strategy ignores weights entirely
    val u = new QuotaAwareConnector(new CountingConnector,
      QuotaConfig(limit = 3, windowMs = 3600000,
        capabilityWeights = Map("quote" -> 100L)), clock)
    assert(u.quote(inst).isRight && u.quote(inst).isRight && u.quote(inst).isRight)
    assert(u.quote(inst).isLeft)
  }

  test("MW6 dynamic scope: info-style internal fan-out consumes zero quota on one shared stack") {
    val clock = new ManualClock(0)
    val inner = new CountingConnector
    val stack = new QuotaAwareConnector(inner, QuotaConfig(limit = 2, windowMs = 3600000), clock)
    // external call consumes the first of 2 units
    assert(stack.quote(inst).isRight)
    // an arbitrarily large internal fan-out (the reference's
    // CallOrigin::scope, info.rs:35-37) consumes nothing
    (1 to 10).foreach { _ =>
      Middleware.internal("info", "info.quote") {
        assert(stack.quote(inst).isRight)
      }
    }
    assert(inner.calls == 11)
    // exactly one unit left for external use
    assert(stack.quote(inst).isRight)
    stack.quote(inst) match {
      case Left(BorsaError.QuotaExceeded(_, _)) => ()
      case other => fail(s"expected quota exhausted by the 2 EXTERNAL calls only, got $other")
    }
  }

  test("MW6 scope survives the fetch worker-pool boundary") {
    val observed = new java.util.concurrent.atomic.AtomicReference[CallOrigin](CallOrigin.External)
    val res = Middleware.internal("info", "stage") {
      graft.router.Fetch.prioritySequential[Int](Seq(
        "x" -> (() => { observed.set(Middleware.currentOrigin.value); Right(1) })), "quote")
    }
    assert(res == Right(1))
    observed.get() match {
      case CallOrigin.Internal("info", "stage") => ()
      case other => fail(s"origin lost across the pool: $other")
    }
  }

  test("MW5 stack order validation: cache→blacklist→quota (builder.rs:73-84)") {
    val base = new CountingConnector
    val good = new CachingConnector(new BlacklistConnector(new QuotaAwareConnector(base)))
    assert(validateStack(good).isRight)
    val bad = new QuotaAwareConnector(new CachingConnector(base))
    assert(validateStack(bad).isLeft)
    val built = buildStack(base).toOption.get
    assert(validateStack(built).isRight)
  }
}
