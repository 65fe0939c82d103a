package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-means trainer for IVF centroids — completes the ANN
  * story: `Similarity.ivfKnnWith` took a pluggable centroid table but
  * nothing produced one, so users had to bring their own.
  *
  * Design for 100 TB, where the corpus is huge and the model tiny:
  *  - Init is a HASH-SEEDED deterministic sample: the nCells vectors with
  *    the smallest `xxhash64(id)` (a TakeOrdered job — no full sort, no
  *    `rand()`, so re-runs and task retries seed identically).
  *  - Each Lloyd round is ONE scan: assignment is the same scan-side
  *    literal-centroid argmin the serving path uses (`ivfCellOf`), and the
  *    per-cell mean reduces via posexplode → partial-aggregated
  *    sum/count per (cell, component) — only nCells × dim partial rows
  *    cross the wire per partition.
  *  - Rounds are FIXED (`iters`), not convergence-polled: no per-round
  *    driver fixpoint reads, and the cost is exactly `iters + 1` scans.
  *  - Only model-sized data ever reaches the driver (nCells × dim doubles
  *    per round).
  *
  * Determinism note: distributed double sums reassociate across partitions,
  * so raw means can differ in the last bits between runs. Means are
  * therefore rounded to 1e-6 before becoming the next round's literals —
  * cross-run FP noise cannot flip a centroid component, so identical
  * inputs train identical models (asserted in the spec). Empty cells keep
  * their previous centroid (no resampling nondeterminism).
  */
object KMeans {

  /** Train `nCells` centroids over `corpus.vecCol` (Array[Float|Double]).
    * Returns the centroid table for `Similarity.ivfKnnWith` /
    * `ivfCellOf` / `ivfProbesOf`.
    */
  def train(
      corpus: DataFrame,
      nCells: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val vecs = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))

    // hash-seeded deterministic init; ties (hash collisions) break on id
    val seeds = vecs
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(nCells)
      .select("__v").collect().map(_.getSeq[Double](0).toIndexedSeq.toSeq).toSeq
    require(seeds.size == nCells,
      s"corpus has only ${seeds.size} non-null vectors for $nCells cells")
    val dim = seeds.head.size

    // a dimension-mismatched vector would null its cell dot products, fall
    // out of the argmin as a NULL cell, and read back as cell 0 through the
    // primitive getter — silently corrupting that centroid. Fail fast.
    val checked = vecs.withColumn("__v", expr(
      s"""if(size(__v) != $dim,
         |  array(cast(raise_error(concat('KMeans.train: vector dimension ', cast(size(__v) as string),
         |    ' != $dim (the seeded dimension) for id ', cast(__id as string))) as double)),
         |  __v)""".stripMargin))

    (0 until iters).foldLeft(seeds) { (centroids, _) =>
      val sums = checked
        .withColumn("__cell", Similarity.ivfCellOf(col("__v"), centroids))
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__comp")))
        .groupBy("__cell", "__pos")
        .agg(sum(col("__comp")).as("__sum"), count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      centroids.zipWithIndex.map { case (prev, c) =>
        (0 until dim).map { p =>
          sums.get((c.toLong, p)) match {
            // 1e-6 rounding: see the determinism note above
            case Some((s, n)) => math.rint(s / n * 1e6) / 1e6
            case None => prev(p) // empty cell: keep the previous centroid
          }
        }
      }
    }
  }
}
