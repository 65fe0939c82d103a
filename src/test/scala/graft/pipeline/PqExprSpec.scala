package graft.pipeline

import graft.SparkSpec
import graft.functions.{PqAdc, PqLut}
import org.apache.spark.sql.functions._

/** Differential spec for the native PQ kernels ([[graft.functions.PqKernel]])
  * against the HOF spellings they replaced — outputs must be
  * BIT-IDENTICAL (the oracle hashes of ext_knn_pq / ext_semdedup_incr
  * must not move).
  */
class PqExprSpec extends SparkSpec {
  import spark.implicits._
  import Similarity._

  private val rnd = new scala.util.Random(43)
  private def vec(): Seq[Float] =
    Seq.fill(PQ_M * PQ_SUBDIM)((rnd.nextDouble() * 2 - 1).toFloat)

  private def vecs(n: Int) =
    (0 until n).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")

  test("PqLut == the HOF pqLutS spelling, element-exact, default and residual codebooks") {
    for (cbs <- Seq(defaultPqCodebooks, refResidualPqCodebooks)) {
      val df = vecs(200).select(
        PqLut.of(col("embedding"), cbs).as("a"),
        expr(pqLutS("embedding", cbs)).as("b"))
      assert(df.where(expr("a != b")).count() == 0)
      assert(df.where(expr("a = b")).count() == 200) // not vacuous via nulls
    }
  }

  test("PqAdc == the HOF pqScoreS spelling on encoded corpora") {
    val corpus = vecs(300)
    val queries = vecs(7)
    val codes = pqEncode(corpus)
    val scored = codes.crossJoin(
        broadcast(queries.select(PqLut.of(col("embedding"), defaultPqCodebooks).as("lut"))))
      .select(PqAdc.of(col("lut"), col("codes")).as("a"),
        expr(pqScoreS("lut", "codes")).as("b"))
    assert(scored.where(expr("a != b")).count() == 0)
    assert(scored.where(expr("a = b")).count() == 300 * 7)
  }

  test("pqCosPpm (Column) == pqCosPpmS (HOF) bit-exact") {
    val corpus = vecs(300)
    val queries = vecs(7)
    val enc = pqEncode(corpus)
    val q = broadcast(queries.select(
      PqLut.of(col("embedding"), defaultPqCodebooks).as("__lut"),
      expr(pqQNorm2S("embedding")).as("__q2")))
    val both = enc.crossJoin(q).select(
      pqCosPpm(col("__lut"), col("codes"), col("__q2"), defaultPqCodebooks).as("a"),
      expr(pqCosPpmS("__lut", "codes", "__q2", defaultPqCodebooks)).as("b"))
    assert(both.where(expr("a != b")).count() == 0)
    assert(both.where(expr("a = b")).count() == 300 * 7)
  }

  test("wrong-dimension vectors fail loudly; kernels run inside codegen (fallback disabled)") {
    val key = "spark.sql.codegen.fallback"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
      val e = intercept[Exception](
        bad.select(PqLut.of(col("embedding"), defaultPqCodebooks)).collect())
      assert(e.getMessage != null && e.getMessage.contains("dimension"))
      // a valid plan executes under disabled fallback (i.e. codegen'd)
      val ok = vecs(5).select(PqLut.of(col("embedding"), defaultPqCodebooks).as("l"))
        .select(PqAdc.of(col("l"),
          expr(s"transform(sequence(1, $PQ_M), x -> 0L)")).as("s"))
        .collect()
      assert(ok.length == 5)
      // out-of-range code ids refuse, never mis-score
      val oob = vecs(1).select(PqLut.of(col("embedding"), defaultPqCodebooks).as("l"))
        .select(PqAdc.of(col("l"), expr(s"transform(sequence(1, $PQ_M), x -> 99L)")))
      val e2 = intercept[Exception](oob.collect())
      assert(e2.getMessage != null && e2.getMessage.contains("outside"))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
