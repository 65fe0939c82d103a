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

  test("PqCodes == the HOF pqCodesS spelling (float input) and pqCodesFromPpmS (ppm input)") {
    for (cbs <- Seq(defaultPqCodebooks, refResidualPqCodebooks)) {
      val df = vecs(300).select(
        graft.functions.PqCodes.of(col("embedding"), cbs).as("a"),
        expr(pqCodesS("embedding", cbs)).as("b"))
      assert(df.where(expr("a != b")).count() == 0)
      assert(df.where(expr("a = b")).count() == 300)
    }
    // already-ppm long-array input (the trainer path)
    val ppm = vecs(150).select(col("vec_id"),
      expr("transform(embedding, x0 -> cast(floor(cast(x0 as double) * 1000000) as bigint))").as("p"))
    val dfp = ppm.select(
      graft.functions.PqCodes.of(col("p"), defaultPqCodebooks).as("a"),
      expr(pqCodesFromPpmS("p", defaultPqCodebooks)).as("b"))
    assert(dfp.where(expr("a != b")).count() == 0)
    assert(dfp.where(expr("a = b")).count() == 150)
  }

  test("PqResidualCodes + PqReconNrm2 == the HOF residual/norm spellings (the ivfPqEncode scan)") {
    val cents = defaultCentroids(64, 8)
    val cbs = refResidualPqCodebooks
    val base = vecs(300)
      .select(col("vec_id"), ivfCellOf(col("embedding"), cents).as("cell"), col("embedding"))
    val codesBoth = base.select(col("cell"),
      graft.functions.PqResidualCodes.of(
        col("embedding"), col("cell"), centroidsPpm(cents), cbs).as("a"),
      expr(pqCodesFromPpmS(residualPpmS("embedding", cents), cbs)).as("b"))
    assert(codesBoth.where(expr("a != b")).count() == 0)
    assert(codesBoth.where(expr("a = b")).count() == 300)
    val withCodes = codesBoth.select(col("cell"), col("a").as("codes"))
    val nrmBoth = withCodes.select(
      graft.functions.PqReconNrm2.of(col("cell"), col("codes"), centroidsPpm(cents), cbs).as("a"),
      expr(reconNrm2S(cents, cbs)).as("b"))
    assert(nrmBoth.where(expr("a != b")).count() == 0)
    assert(nrmBoth.where(expr("a = b")).count() == 300)
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

  test("PqLut: an already-ppm long array builds the identical LUT to its float spelling") {
    import org.apache.spark.sql.functions._
    val vf = Seq((1L, Seq.tabulate(64)(i => i * 0.01f - 0.3f)))
      .toDF("vec_id", "embedding")
    val vl = vf.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000) as bigint))")
        .as("embedding"))
    def lutOf(df: org.apache.spark.sql.DataFrame) =
      df.select(graft.functions.PqLut.of(col("embedding"), Similarity.defaultPqCodebooks))
        .collect().map(_.getSeq[Seq[Long]](0)).toSeq
    assert(lutOf(vf) == lutOf(vl), "long-ppm input must be the float path's quantization")
  }
}
