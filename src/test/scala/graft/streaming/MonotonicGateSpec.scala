package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec
import graft.streaming.MonotonicGate._

/** ST8: the streaming gate must agree with the batch replay and with the
  * in-memory reference model on the same input order (SURVEY QI-ST8;
  * reference filters_monotonic.rs).
  */
class MonotonicGateSpec extends SparkSpec {
  import spark.implicits._

  private def genUpdates(seed: Long, n: Int): Seq[Update] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      Update(symbol = s"S${r.nextInt(3)}", arrival = i.toLong, ts = 1000L + r.nextInt(50))
    }
  }

  test("batch replay == reference model (25 random seeds)") {
    (1 to 25).foreach { seed =>
      val updates = genUpdates(seed, 60)
      val expected = referenceModel(updates)
      val got = batchReplay(updates.toDF())
        .orderBy("symbol", "arrival").as[Update].collect().toSeq
      assert(got.sortBy(u => (u.symbol, u.arrival)) ==
        expected.sortBy(u => (u.symbol, u.arrival)), s"seed=$seed")
    }
  }

  test("equal timestamps pass the gate (filters.rs:44-74)") {
    val updates = Seq(
      Update("S", 0, 100), Update("S", 1, 100), Update("S", 2, 99), Update("S", 3, 101))
    assert(referenceModel(updates).map(_.arrival) == Seq(0L, 1L, 3L))
    val got = batchReplay(updates.toDF()).as[Update].collect().toSeq
    assert(got.map(_.arrival).sorted == Seq(0L, 1L, 3L))
  }

  test("streaming gate via flatMapGroupsWithState == batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val updates = genUpdates(7, 120)
    val input = MemoryStream[Update]
    val gated = streamingGate(input.toDS(), stateTtlMs = 0) // NoTimeout: lets processAllAvailable quiesce
    val query = gated.writeStream
      .format("memory").queryName("gate_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // feed in three micro-batches, preserving arrival order across batches
      updates.grouped(40).foreach { batch =>
        input.addData(batch)
        query.processAllAvailable()
      }
      val got = spark.table("gate_out").as[Update].collect().toSeq
        .sortBy(u => (u.symbol, u.arrival))
      val expected = referenceModel(updates).sortBy(u => (u.symbol, u.arrival))
      assert(got == expected)
    } finally query.stop()
  }

  test("ST9 allow-set filter drops unassigned symbols") {
    val df = Seq(("A", 1L, 1L), ("B", 2L, 2L), ("C", 3L, 3L)).toDF("symbol", "arrival", "ts")
    val out = allowSetFilter(df, Set("A", "C")).select("symbol").as[String].collect().toSet
    assert(out == Set("A", "C"))
  }

  test("ST10 multiplex unions streams") {
    val a = Seq(("A", 1L, 1L)).toDF("symbol", "arrival", "ts")
    val b = Seq(("B", 2L, 2L)).toDF("symbol", "arrival", "ts")
    assert(multiplex(Seq(a, b)).count() == 2)
  }
}
