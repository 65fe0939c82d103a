package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors._
import graft.core.Errors.BorsaError._

class ErrorsSpec extends AnyFunSuite {

  test("retry classes (error.rs:184-224)") {
    assert(Unsupported("x").retryClass == RetryClass.Permanent)
    assert(NotFound("x").retryClass == RetryClass.Permanent)
    assert(ProviderTimeout("p", "c").retryClass == RetryClass.Transient)
    assert(QuotaExceeded(1, 2).retryClass == RetryClass.Transient)
    assert(Data("x").retryClass == RetryClass.Unknown)
    assert(Connector("p", RateLimitExceeded(1, 1)).retryClass == RetryClass.Transient)
    // aggregate: any permanent -> permanent; all transient -> transient; else unknown
    assert(AllProvidersFailed(Seq(NotFound("x"), ProviderTimeout("p", "c"))).retryClass
      == RetryClass.Permanent)
    assert(AllProvidersFailed(Seq(RateLimitExceeded(1, 1), ProviderTimeout("p", "c"))).retryClass
      == RetryClass.Transient)
    assert(AllProvidersFailed(Seq(Data("x"), ProviderTimeout("p", "c"))).retryClass
      == RetryClass.Unknown)
  }

  test("actionable: unsupported/notfound are not; aggregates by contents (error.rs:156-166)") {
    assert(!Unsupported("x").isActionable)
    assert(!NotFound("x").isActionable)
    assert(Data("x").isActionable)
    assert(!AllProvidersFailed(Seq(NotFound("a"), Unsupported("b"))).isActionable)
    assert(AllProvidersFailed(Seq(NotFound("a"), Data("b"))).isActionable)
  }

  test("flatten unwraps nested aggregates (error.rs:168-181)") {
    val nested = AllProvidersFailed(Seq(
      AllProvidersFailed(Seq(NotFound("a"), Data("b"))), Other("c")))
    assert(nested.flatten == List(NotFound("a"), Data("b"), Other("c")))
  }

  test("collapse F5 (util.rs:31-58)") {
    assert(collapse(Nil, "quote", None) == Unsupported("quote"))
    assert(collapse(Seq(ProviderTimeout("a", "q"), Connector("b", ProviderTimeout("b", "q"))),
      "q", None) == AllProvidersTimedOut("q"))
    assert(collapse(Seq(NotFound("x"), Connector("b", NotFound("y"))), "q", Some("quote for S"))
      == NotFound("quote for S"))
    val mixed = Seq(NotFound("x"), Data("y"))
    assert(collapse(mixed, "q", Some("w")) == AllProvidersFailed(mixed))
  }

  test("collapseStream ST11 (streaming/error.rs:3-14)") {
    assert(collapseStream(Nil, "stream-quotes") == Unsupported("stream-quotes"))
    assert(collapseStream(Seq(NotFound("x"), Unsupported("y")), "s") == Unsupported("s"))
    assert(collapseStream(Seq(Data("x")), "s") == Data("x"))
    assert(collapseStream(Seq(Data("x"), Other("y")), "s")
      == AllProvidersFailed(Seq(Data("x"), Other("y"))))
    // nested aggregates flatten before classification
    assert(collapseStream(Seq(AllProvidersFailed(Seq(Data("x")))), "s") == Data("x"))
  }

  test("rate-limit heuristic MW4 (quota.rs:211-227)") {
    assert(normalizeRateLimit(Data("HTTP 429 from upstream")) == RateLimitExceeded(0, 0))
    assert(normalizeRateLimit(Other("Rate limit hit")) == RateLimitExceeded(0, 0))
    assert(normalizeRateLimit(Connector("p", Other("too many requests")))
      == Connector("p", RateLimitExceeded(0, 0)))
    assert(normalizeRateLimit(Data("boring")) == Data("boring"))
  }
}
