package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VecDot parity with the `aggregate(zip_with(...))` HOF form it replaced:
  * same value on clean input, NULL on length mismatch, and NULL when any
  * ELEMENT is null (the HOF fold is null-poisoned; a truncated or
  * malformed embedding must stay excluded from similarity results).
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  test("double arrays: VecDot == HOF fold, same IEEE accumulation order") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      VecDot.of(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("float arrays widen to double like the HOF form") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val v = df.select(VecDot.of(col("a"), col("b"))).head.getDouble(0)
    assert(v == 1.5f.toDouble * 2.0f.toDouble + 2.5f.toDouble * 4.0f.toDouble)
  }

  test("length mismatch -> NULL (truncated embedding excluded, not partially scored)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(VecDot.of(col("a"), col("b"))).head.isNullAt(0))
  }

  test("null ELEMENT -> NULL, matching zip_with/aggregate null poisoning") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, null, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(
      VecDot.of(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof")).collect()
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1)) }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 11.0)
  }

  test("null ARRAY -> NULL (nullIntolerant)") {
    val df = Seq((Option(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(VecDot.of(col("a"), col("b"))).head.isNullAt(0))
  }
}
