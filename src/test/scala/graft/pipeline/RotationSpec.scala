package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RotationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("rotation training: partition-shape independent, orthonormal components, frozen literal reproduced") {
    val a = Rotation.trainPpm(emb.repartition(1), iters = 50)
    val b = Rotation.trainPpm(emb.repartition(7), iters = 50)
    assert(a == b, "trained rotation must not depend on partition shape")
    // orthonormality of the double-precision components (top block —
    // beyond the corpus rank deflation degrades gracefully)
    val v = Rotation.train(emb.repartition(3), iters = 50)
    for (i <- 0 until 8; j <- 0 until 8) {
      val d = v(i).zip(v(j)).map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-6, s"component dot($i,$j) = $d, want $want")
    }
    // the frozen serving literal has full shape and plausible scale
    assert(Similarity.refRotationPpm.length == 64 &&
      Similarity.refRotationPpm.forall(_.length == 64))
    Similarity.refRotationPpm.foreach { row =>
      val n2 = row.map(x => x.toDouble * x).sum
      assert(math.abs(n2 - 1e12) < 1e9, s"frozen row norm^2 = $n2, want ~1e12 (unit in ppm)")
    }
  }

  test("MatVecFloor: expression == driver kernel math; codegen path; null/length guards") {
    val key = "spark.sql.codegen.fallback"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val rot = Similarity.refRotationPpm
      val rows = emb.where(col("embedding").isNotNull).limit(3)
        .select(col("vec_id"), col("embedding"),
          Similarity.rotatePpm(col("embedding")).as("rv"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val x = r.getSeq[Float](1)
        val got = r.getSeq[Double](2)
        val want = rot.map { row =>
          var acc = 0.0
          var i = 0
          while (i < 64) { acc += row(i).toDouble * x(i).toDouble; i += 1 }
          math.floor(acc)
        }
        assert(got == want, s"vec ${r.getLong(0)}: expression diverged from kernel math")
        got.foreach(v => assert(v == math.rint(v), "outputs must be exact integers"))
      }
      // wrong-length and null vectors poison to NULL, not partial output
      val bad = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
        .toDF("vec_id", "embedding")
      val out = bad.select(Similarity.rotatePpm(col("embedding"))).collect()
      assert(out.forall(_.isNullAt(0)), "short/null vectors must rotate to NULL")
      // a non-float/double element type must REFUSE at ANALYSIS time
      // (the KmvDistinct checkInputDataTypes discipline), never
      // reinterpret long bits through getDouble nor launch a task
      val longs = Seq((1L, Seq.fill(64)(1L))).toDF("vec_id", "embedding")
      val e = intercept[org.apache.spark.sql.AnalysisException](
        longs.select(Similarity.rotatePpm(col("embedding"))).collect())
      assert(e.getMessage.contains("mat_vec_floor: unsupported input type"),
        s"want the unsupported-type refusal at analysis, got $e")
    } finally {
      prior match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }
}
