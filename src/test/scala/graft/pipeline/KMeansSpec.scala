package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deterministic k-means trainer must (1) actually learn structure —
  * perfect cluster purity on a separable fixture, (2) raise IVF recall on
  * the driver embeddings over the untrained pseudo-random centroids, and
  * (3) train bit-identical models on identical inputs (the plan-
  * determinism requirement for anything that feeds plan construction).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated clusters: center c has 30 points at one-hot-ish
    * direction c with ±0.05 deterministic noise.
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(5)
    val rows = for (c <- 0 until 4; i <- 0 until 30) yield {
      val v = Array.tabulate(8)(d =>
        (if (d == c * 2) 1.0 else 0.0) + (rnd.nextDouble() - 0.5) * 0.1)
      ((c * 30 + i).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("separable clusters: trained cells recover the clusters with purity 1.0") {
    val centroids = KMeans.train(clustered, nCells = 4, iters = 3)
    val assigned = clustered
      .withColumn("cell", Similarity.ivfCellOf(col("embedding").cast("array<double>"), centroids))
      .select("cluster", "cell").collect().map(r => r.getInt(0) -> r.getLong(1))
    // every cluster maps to exactly one cell and no two clusters share one
    val byCluster = assigned.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byCluster.values.forall(_.size == 1), s"impure cells: $byCluster")
    assert(byCluster.values.flatten.toSet.size == 4, s"merged clusters: $byCluster")
  }

  test("a dimension-mismatched vector fails fast instead of corrupting a centroid") {
    val mixed = clustered.select($"vec_id", $"embedding")
      .unionByName(Seq((999L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // (the offender may be seeded first, in which case the OTHER vectors
    // mismatch — either way training must raise, naming some id)
    val e = intercept[Exception] { KMeans.train(mixed, nCells = 4, iters = 1) }
    assert(messages(e).exists(m => m.contains("vector dimension")), s"got: $e")
  }

  test("training is deterministic: identical inputs produce identical models") {
    val a = KMeans.train(clustered, nCells = 4, iters = 3)
    val b = KMeans.train(clustered, nCells = 4, iters = 3)
    assert(a == b)
  }

  test("driver embeddings: trained IVF recall@10 >= untrained at equal nprobe") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir not present")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10

    def hits(knn: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]]): Long =
      knn.select("query_id", "neighbor_id").collect()
        .count(r => truth(r.getLong(0)).contains(r.getLong(1))).toLong

    val truth = Similarity.bruteForceKnn(emb, queries, k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val trained = KMeans.train(emb, nCells = 8, iters = 3)
    val recallTrained = hits(Similarity.ivfKnnWith(emb, queries, k, trained, nprobe = 2), truth)
    val recallDefault = hits(Similarity.ivfKnn(emb, queries, k, nCells = 8, nprobe = 2), truth)
    assert(recallTrained >= recallDefault,
      s"trained recall $recallTrained < untrained $recallDefault (of ${truth.values.map(_.size).sum})")
    // and training must not have broken the contract that probing every
    // cell recovers the exact answer
    val full = hits(Similarity.ivfKnnWith(emb, queries, k, trained, nprobe = 8), truth)
    assert(full == truth.values.map(_.size).sum, s"nprobe=all must be exact, got $full")
  }
}
