package graft.timeseries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Currency invariants (currency_invariants.rs:43,73) + remaining property
  * ports: dedup associativity/commutativity (dedup_props.rs:81) and UTC
  * equivalence between meta and plain bucketing (resample_props.rs:282).
  */
class CurrencySpec extends SparkSpec {
  import spark.implicits._

  test("violations: empty on uniform data, reports mixed symbols") {
    val clean = Seq(("S", "USD"), ("S", "USD"), ("T", "EUR")).toDF("symbol", "currency")
    assert(Currency.violations(clean).count() == 0)
    val dirty = clean.union(Seq(("S", "EUR")).toDF("symbol", "currency"))
    val v = Currency.violations(dirty).collect()
    assert(v.length == 1 && v(0).getAs[String]("symbol") == "S")
  }

  test("ensureUniform passes clean data through and aborts on mixed currencies") {
    val clean = Seq(("S", "USD", 1), ("S", "USD", 2)).toDF("symbol", "currency", "v")
    assert(Currency.ensureUniform(clean).count() == 2)
    val dirty = Seq(("S", "USD", 1), ("S", "EUR", 2)).toDF("symbol", "currency", "v")
    val ex = intercept[Exception] { Currency.ensureUniform(dirty).count() }
    assert(ex.getMessage.contains("currency invariant violated")
      || Option(ex.getCause).exists(_.getMessage.contains("currency invariant violated")))
  }

  test("stripUnadjusted clears close_unadj and is a no-op without the column") {
    val df = Seq(("S", BigDecimal(1))).toDF("symbol", "close_unadj")
    assert(Currency.stripUnadjusted(df).collect()(0).isNullAt(1))
    val no = Seq(("S", 1)).toDF("symbol", "v")
    assert(Currency.stripUnadjusted(no).collect()(0).getInt(1) == 1)
  }

  test("action dedup is associative and commutative over inputs (dedup_props.rs:81)") {
    def acts(rows: (Long, String, Int)*) =
      rows.toSeq.map { case (ts, k, a) => (ts, k, BigDecimal(a), "USD") }
        .toDF("ts", "kind", "amount", "currency")
    val a = acts((1, "dividend", 1), (2, "split", 2), (1, "dividend", 1))
    val b = acts((2, "split", 2), (3, "capital_gain", 3))
    def canon(df: org.apache.spark.sql.DataFrame) =
      Merge.dedupActions(df).collect().toSeq
    assert(canon(a.union(b)) == canon(b.union(a)))                       // commutative
    assert(canon(Merge.dedupActions(a).union(b)) == canon(a.union(b)))   // associative w/ pre-dedup
    assert(canon(Merge.dedupActions(a.union(b))) == canon(a.union(b)))   // idempotent
  }

  test("UTC-zone local bucketing equals plain UTC bucketing (resample_props.rs:282)") {
    val rnd = new scala.util.Random(5)
    val ticks = (0 until 200).map { i =>
      ("S", 1704067200L + rnd.nextInt(500000).toLong, BigDecimal(i % 50), i.toLong)
    }.toDF("symbol", "secs", "price", "volume").withColumn("ts", col("secs"))
    val plain = Resample.toDaily(ticks).orderBy("symbol", "bucket_ts").collect().toSeq
    val viaTz = Resample.toDailyLocal(ticks, "UTC").orderBy("symbol", "bucket_ts").collect().toSeq
    assert(plain == viaTz)
    val plainW = Resample.toWeekly(ticks).orderBy("symbol", "bucket_ts").collect().toSeq
    val viaTzW = Resample.toWeeklyLocal(ticks, "UTC").orderBy("symbol", "bucket_ts").collect().toSeq
    assert(plainW == viaTzW)
  }
}
