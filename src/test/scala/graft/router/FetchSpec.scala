package graft.router

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Errors.BorsaError
import graft.router.Fetch._

class FetchSpec extends AnyFunSuite {

  test("F3 a THROWING connector becomes a tagged Connector error and the chain continues") {
    val result = prioritySequential[Int](Seq(
      "boom" -> (() => throw new RuntimeException("kapow")),
      "ok" -> (() => Right(42))), "quote")
    assert(result == Right(42))
    // all throwing: the thrown error is recorded, not lost
    prioritySequential[Int](Seq(
      "boom" -> (() => throw new RuntimeException("kapow"))), "quote") match {
      case Left(BorsaError.AllProvidersFailed(
        Seq(BorsaError.Connector("boom", BorsaError.Other(msg))))) =>
        assert(msg.contains("kapow"))
      case other => fail(s"expected tagged Connector error in the collapse, got $other")
    }
  }

  test("F4 all-fail race records thrown errors and collapses to AllProvidersFailed, not Unsupported") {
    latencyRace[Int](Seq(
      "boom" -> (() => throw new RuntimeException("kapow")),
      "bad" -> (() => Left(BorsaError.Data("x")))), "quote") match {
      case Left(BorsaError.AllProvidersFailed(errs)) =>
        assert(errs.size == 2)
      case other => fail(s"expected AllProvidersFailed(2), got $other")
    }
  }

  test("F3 fallback: first success wins, NotFound continues (core.rs:499-550)") {
    var called = List.empty[String]
    val result = prioritySequential[Int](Seq(
      "a" -> (() => { called ::= "a"; Left(BorsaError.NotFound("x")) }),
      "b" -> (() => { called ::= "b"; Right(42) }),
      "c" -> (() => { called ::= "c"; Right(99) })), "quote")
    assert(result == Right(42))
    assert(called.reverse == List("a", "b"))
  }

  test("F3 all NotFound collapses to NotFound with the noun (util.rs:31-58)") {
    val result = prioritySequential[Int](Seq(
      "a" -> (() => Left(BorsaError.NotFound("x"))),
      "b" -> (() => Left(BorsaError.NotFound("y")))),
      "quote", notFoundWhat = Some("quote for S"))
    assert(result == Left(BorsaError.NotFound("quote for S")))
  }

  test("F3 per-call timeout becomes ProviderTimeout; all timeouts collapse") {
    val cfg = Config(providerTimeout = 100.millis)
    val result = prioritySequential[Int](Seq(
      "slow1" -> (() => { Thread.sleep(3000); Right(1) }),
      "slow2" -> (() => { Thread.sleep(3000); Right(2) })), "quote", cfg)
    assert(result == Left(BorsaError.AllProvidersTimedOut("quote")))
  }

  test("F3 postOk demotion continues the chain (F6, core.rs:276-296)") {
    val result = prioritySequential[Int](Seq(
      "a" -> (() => Right(1)),
      "b" -> (() => Right(2))), "quote",
      postOk = (v: Int) => if (v == 1) Left(BorsaError.NotFound("wrong exchange")) else Right(v))
    assert(result == Right(2))
  }

  test("F4 latency race: first success wins (core.rs:560-616)") {
    val result = latencyRace[Int](Seq(
      "slow" -> (() => { Thread.sleep(500); Right(1) }),
      "fast" -> (() => Right(2))), "quote",
      Config(providerTimeout = 2.seconds))
    assert(result == Right(2))
  }

  test("F4 all failures collapse") {
    val result = latencyRace[Int](Seq(
      "a" -> (() => Left(BorsaError.Data("x"))),
      "b" -> (() => Left(BorsaError.Data("y")))), "quote",
      Config(providerTimeout = 1.second))
    result match {
      case Left(BorsaError.AllProvidersFailed(errs)) => assert(errs.size == 2)
      case other => fail(s"expected aggregate failure, got $other")
    }
  }

  test("F4 empty provider list is Unsupported") {
    assert(latencyRace[Int](Nil, "quote") == Left(BorsaError.Unsupported("quote")))
  }
}
