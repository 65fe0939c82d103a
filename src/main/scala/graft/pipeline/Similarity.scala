package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design:
  *  - Brute force: broadcast the (small) query set against the (huge)
  *    corpus — one scan, no shuffle of the corpus; per-partition top-k via
  *    window. This is the correctness baseline.
  *  - LSH (random hyperplanes): bucket assignment is scan-side integer
  *    arithmetic; the join is bucket-equi, so the corpus never crosses the
  *    network except for matching buckets. At 1000 executors the bucket id
  *    doubles as the shuffle/partition key.
  *  All dot products run in double via fold-left (deterministic order —
  *  no FP-reassociation nondeterminism across partitions).
  */
object Similarity {
  import graft.functions.VecDot

  /** dot(a, b) in double via the native codegen'd [[VecDot]] expression —
    * strict left-to-right accumulation (deterministic; bit-identical to
    * the interpreted fold it replaced).
    */
  def dot(a: Column, b: Column): Column = VecDot.of(a, b)

  /** ||a|| in double. */
  def norm(a: Column): Column = sqrt(VecDot.of(a, a))

  /** cosine(a, b) in double (per-pair form; prefer precomputed norms in
    * joins — see bruteForceKnn).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` should be small (broadcast); ties broken by neighbor id.
    * Norms are computed ONCE PER ROW before the join — the per-pair work is
    * a single dot fold (3× fewer interpreted folds than naive cosine; the
    * resulting double is bit-identical since each factor is unchanged).
    */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", norm(col("qv"))))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .withColumn("nnorm", norm(col("nv")))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** HARD-NEGATIVE MINING — the contrastive-training data operator: for
    * each query vector, the top-k most cosine-similar corpus vectors
    * with a DIFFERENT label. "Hard" = high similarity yet wrong class —
    * the negatives that actually move a contrastive loss, where random
    * negatives are trivially separable (the mining step retrieval/
    * embedding training pipelines à la DPR run between epochs). The
    * label filter runs BEFORE the top-k window, so every query gets k
    * negatives whenever the corpus holds k off-label vectors; rows with
    * a NULL label on either side drop (a null can't certify "different
    * class"), visibly reducing that query's negative pool rather than
    * silently matching.
    *
    * Output (query_id, rank, neighbor_id, neg_label) with the
    * [[bruteForceKnn]] tie-break (sim desc, neighbor id) — deterministic
    * and oracle-hashable. Scale shape: mining batches are epoch-sized,
    * so the query side broadcasts and the corpus never shuffles; for a
    * web-scale corpus use [[hardNegativesIvf]] — the celled probe with
    * the same post-join label predicate.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"hardNegatives: k must be >= 1, got $k")
    val missing = Seq(idCol, vecCol, labelCol).filterNot(c =>
      corpus.columns.contains(c) && queries.columns.contains(c))
    require(missing.isEmpty,
      s"hardNegatives: corpus and queries must both carry ${missing.mkString(", ")}")
    val q = broadcast(queries.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col(labelCol).as("ql"))
      .withColumn("qnorm", norm(col("qv"))))
    val scored = corpus.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        col(labelCol).as("neg_label"))
      .withColumn("nnorm", norm(col("nv")))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id") && col("neg_label") =!= col("ql"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "neg_label")
  }

  /** IVF-CELLED hard-negative mining — [[hardNegatives]] for the
    * web-scale corpus its scaladoc names (the swap it promised, now
    * composed — the [[marginMinedPairsIvf]] discipline): the corpus
    * assigns to cells scan-side, each query probes its `nprobe` nearest
    * cells, and the label-inequality filter applies post-join exactly as
    * in the exact form. The probe join is an EQUI-join on the cell id
    * (the query side still broadcasts — mining batches are epoch-sized),
    * so the corpus never pairs all-to-all; recall follows the quantizer
    * (nprobe = nCells reproduces the exact output, spec-asserted).
    * Output contract identical to [[hardNegatives]].
    */
  def hardNegativesIvf(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Seq[Seq[Double]],
      k: Int,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"hardNegativesIvf: k must be >= 1, got $k")
    require(nprobe >= 1, s"hardNegativesIvf: nprobe must be >= 1, got $nprobe")
    require(centroids.nonEmpty && centroids.map(_.size).distinct.size == 1,
      "centroids must be a non-empty table of equal-dimension vectors")
    val missing = Seq(idCol, vecCol, labelCol).filterNot(c =>
      corpus.columns.contains(c) && queries.columns.contains(c))
    require(missing.isEmpty,
      s"hardNegativesIvf: corpus and queries must both carry ${missing.mkString(", ")}")
    val q = broadcast(queries.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col(labelCol).as("ql"))
      .withColumn("cell", explode(ivfProbesOf(col("qv"), centroids, nprobe)))
      .withColumn("qnorm", norm(col("qv"))))
    val scored = corpus.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        col(labelCol).as("neg_label"))
      .withColumn("cell", ivfCellOf(col("nv"), centroids))
      .withColumn("nnorm", norm(col("nv")))
      .join(q, "cell")
      .where(col("neighbor_id") =!= col("query_id") && col("neg_label") =!= col("ql"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "neg_label")
  }

  /** MARGIN-BASED BITEXT MINING — the parallel-corpus miner (Artetxe &
    * Schwenk's margin criterion, the method behind CCMatrix/LASER-mined
    * MT corpora): a source-language and a target-language embedding set
    * pair up where the cross-lingual similarity stands out RELATIVE to
    * each side's neighborhood — absolute cosine alone over-pairs hubs
    * (vectors similar to everything), so each pair's score is its
    * similarity divided by the mean of both endpoints' k-NN
    * similarities, and only MUTUAL best matches survive.
    *
    * Integer-exact variant (the repo's ppm discipline): cosines map to
    * [0, 2e6] ppm via floor((cos+1)·1e6) — nonnegative integers, so
    * top-k sums and the ratio margin
    *   margin_ppm = 2e6 · c / (Σ topk(x) + Σ topk(y))
    * are engine-bit-identical (float top-k AVERAGES would accumulate in
    * engine-dependent order and flip near-ties). The shift is a
    * documented variant of the raw-cosine margin: selection differs
    * only where margins nearly tie. Ties break by id — total order.
    *
    * Output: mutual-best (src_id, tgt_id, margin_ppm) pairs. Scale
    * shape: this is the EXACT form (all-pairs cosine — the oracle
    * baseline for eval-sized sides; the small target side broadcasts so
    * the pairing is a nested-loop over streamed source partitions, never
    * a sort-merge cartesian); at CCMatrix scale, where BOTH sides are
    * corpus-sized, use [[marginMinedPairsIvf]] — the same margin/mutual
    * kernel ([[marginMutualOf]]) over IVF candidate pairs.
    */
  def marginMinedPairs(
      src: DataFrame,
      tgt: DataFrame,
      k: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"marginMinedPairs: k must be >= 1, got $k")
    val s = src.where(col(vecCol).isNotNull)
      .select(col(idCol).as("src_id"), col(vecCol).as("sv"))
      .withColumn("snorm", norm(col("sv")))
    val t = tgt.where(col(vecCol).isNotNull)
      .select(col(idCol).as("tgt_id"), col(vecCol).as("tv"))
      .withColumn("tnorm", norm(col("tv")))
    val pairs = s.crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"), cosinePpm.as("__c"))
    marginMutualOf(pairs, k)
  }

  /** floor((cos+1)·1e6) over the (sv, snorm, tv, tnorm) pair columns —
    * the integer cosine both margin-mining forms score with.
    */
  private def cosinePpm: Column =
    floor((dot(col("sv"), col("tv")) / (col("snorm") * col("tnorm")) + lit(1.0))
      * lit(1000000.0)).cast("long")

  /** The margin/mutual kernel shared by [[marginMinedPairs]] (exact —
    * the oracle) and [[marginMinedPairsIvf]] (celled — the scale path):
    * per-side top-k neighborhood sums over the given candidate pairs,
    * the integer ratio margin, and the mutual-best filter. `pairs` must
    * carry (src_id, tgt_id, __c); it persists here because the windows
    * and the margin join re-read it.
    */
  private def marginMutualOf(pairsIn: DataFrame, k: Int): DataFrame = {
    val pairs = pairsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wx = Window.partitionBy("src_id").orderBy(col("__c").desc, col("tgt_id"))
    val wy = Window.partitionBy("tgt_id").orderBy(col("__c").desc, col("src_id"))
    val ranked = pairs
      .withColumn("__rx", row_number().over(wx))
      .withColumn("__ry", row_number().over(wy))
    val sax = ranked.where(col("__rx") <= k).groupBy("src_id").agg(sum("__c").as("__sax"))
    val say = ranked.where(col("__ry") <= k).groupBy("tgt_id").agg(sum("__c").as("__say"))
    val margins = pairs.join(sax, "src_id").join(say, "tgt_id")
      .withColumn("margin_ppm", expr("(2000000 * __c) DIV greatest(__sax + __say, 1)"))
    val bx = Window.partitionBy("src_id").orderBy(col("margin_ppm").desc, col("tgt_id"))
    val by = Window.partitionBy("tgt_id").orderBy(col("margin_ppm").desc, col("src_id"))
    margins
      .withColumn("__bx", row_number().over(bx))
      .withColumn("__by", row_number().over(by))
      .where(col("__bx") === 1 && col("__by") === 1)
      .select("src_id", "tgt_id", "margin_ppm")
  }

  /** IVF-CELLED margin mining — [[marginMinedPairs]] for corpus-sized
    * sides (the CCMatrix-scale workload, where mining 1e9 × 1e9
    * sentences all-pairs is quadratic in BOTH sides): candidate pairs
    * come from the IVF coarse quantizer instead of the cross product,
    * then the SAME margin/mutual kernel runs on them.
    *
    * Candidate generation is SYMMETRIC (the union of both directions'
    * probes — src probing into tgt cells AND tgt probing into src
    * cells), because the margin needs each side's neighborhood: a pair
    * visible from only one side would truncate the other side's top-k
    * sum. Both directions are EQUI-joins on the cell id — the corpus
    * shuffles (or at scale is pre-bucketed) by cell, never broadcast,
    * never paired all-to-all; candidates dedup on the fixed-width
    * (src_id, tgt_id, __c) triple before the kernel.
    *
    * Approximation contract: pairs and neighborhood sums are computed
    * over cell-mates only, so a translation pair split across non-probed
    * cells is missed (recall follows the quantizer, tuned via `nprobe`
    * and centroid training — [[KMeans.train]] output plugs in as
    * `centroids`), and a margin denominator can only SHRINK vs exact
    * (missing candidates lower the top-k sums, never raise them). With
    * `nprobe` = nCells the candidate set is the full cross product and
    * the output equals [[marginMinedPairs]] (spec-asserted).
    */
  def marginMinedPairsIvf(
      src: DataFrame,
      tgt: DataFrame,
      centroids: Seq[Seq[Double]],
      k: Int = 4,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"marginMinedPairsIvf: k must be >= 1, got $k")
    require(nprobe >= 1, s"marginMinedPairsIvf: nprobe must be >= 1, got $nprobe")
    require(centroids.nonEmpty && centroids.map(_.size).distinct.size == 1,
      "centroids must be a non-empty table of equal-dimension vectors")
    val s = src.where(col(vecCol).isNotNull)
      .select(col(idCol).as("src_id"), col(vecCol).as("sv"))
      .withColumn("snorm", norm(col("sv")))
      .withColumn("scell", ivfCellOf(col("sv"), centroids))
    val t = tgt.where(col(vecCol).isNotNull)
      .select(col(idCol).as("tgt_id"), col(vecCol).as("tv"))
      .withColumn("tnorm", norm(col("tv")))
      .withColumn("tcell", ivfCellOf(col("tv"), centroids))
    // direction 1: src probes its nprobe nearest cells into tgt's cells
    val d1 = s.withColumn("cell", explode(ivfProbesOf(col("sv"), centroids, nprobe)))
      .join(t.withColumnRenamed("tcell", "cell"), "cell")
    // direction 2: tgt probes into src's cells
    val d2 = s.withColumnRenamed("scell", "cell")
      .join(t.withColumn("cell", explode(ivfProbesOf(col("tv"), centroids, nprobe))), "cell")
    def scored(df: DataFrame): DataFrame =
      df.select(col("src_id"), col("tgt_id"), cosinePpm.as("__c"))
    marginMutualOf(scored(d1).unionByName(scored(d2)).distinct(), k)
  }

  /** RECALL-vs-NPROBE SWEEP for the celled miners — the tuning artifact
    * that justifies a production `nprobe`: for every exact mined pair,
    * the smallest SYMMETRIC nprobe at which the pair would enter
    * [[marginMinedPairsIvf]]'s candidate set,
    *
    *   p*(s, t) = min(rank of cell(t) among s's ranked cells,
    *              rank of cell(s) among t's ranked cells)
    *
    * (the two directions of the symmetric candidate join), then the
    * whole curve nprobe ∈ [1, nCells] from ONE frame — the pair is a
    * candidate at nprobe p iff p* <= p. This measures CANDIDATE recall,
    * the quantity nprobe actually tunes; the margin kernel downstream
    * is exact on candidates and its denominator only SHRINKS with
    * missing candidates (the [[marginMinedPairsIvf]] approximation
    * analysis), so candidate presence is the right per-nprobe proxy —
    * final-pair recall at the production nprobe stays separately
    * measured (ext_bitext_recall). At nprobe = nCells the curve ends at
    * 1e6 ppm by construction (every cell probed = the cross product).
    *
    * Scale shape: `exactPairs` is an audit-sized mined-pair table (the
    * sampled-and-staged-truth discipline applies at corpus scale); the
    * sweep itself is two id-equi joins to fetch the pair's vectors and
    * one scan-side ranking per side — no re-mining per nprobe point.
    * Output: (nprobe, n_exact, n_candidate, recall_ppm).
    */
  def ivfNprobeSweep(
      src: DataFrame,
      tgt: DataFrame,
      exactPairs: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && centroids.map(_.size).distinct.size == 1,
      "centroids must be a non-empty table of equal-dimension vectors")
    val n = centroids.size
    // 1-based rank of `cellId` in the vector's best-first cell ranking —
    // EXACTLY ivfProbesOf's order (same score structs, same sort), so
    // rank <= p iff the cell is probed at nprobe p
    def rankOf(vec: Column, cellId: Column): Column =
      array_position(
        transform(array_sort(cellScoresOf(vec, centroids)), s => s.getField("cid")),
        cellId)
    val s = src.where(col(vecCol).isNotNull)
      .select(col(idCol).as("src_id"), col(vecCol).as("__sv"))
    val t = tgt.where(col(vecCol).isNotNull)
      .select(col(idCol).as("tgt_id"), col(vecCol).as("__tv"))
    exactPairs.select("src_id", "tgt_id")
      .join(s, "src_id")
      .join(t, "tgt_id")
      .select(
        least(
          rankOf(col("__sv"), ivfCellOf(col("__tv"), centroids)),
          rankOf(col("__tv"), ivfCellOf(col("__sv"), centroids))).as("__pstar"))
      .select(col("__pstar"), explode(expr(s"sequence(1, $n)")).as("nprobe"))
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("__pstar") <= col("nprobe"), 1L).otherwise(0L)).as("n_candidate"))
      .select(col("nprobe").cast("long").as("nprobe"), col("n_exact"),
        col("n_candidate"),
        expr("n_candidate * 1000000 DIV greatest(n_exact, 1)").as("recall_ppm"))
  }

  /** INT8 QUANTIZATION — the memory-bound scale path for a 100 TB
    * embedding store: a float32 corpus quantized symmetrically per vector
    * to [-127, 127] is 4x smaller on disk and in executor memory, which
    * at this scale is usually the difference between an in-memory probe
    * and a spill. All arithmetic is EXACT integer so the oracle hashes:
    * components go to ppm via floor (the ext_dedup_embed convention —
    * floor is identical in both engines), the per-vector scale m is the
    * max |component| in ppm, and quantization divides with explicit
    * truncate-toward-zero on both signs (engine-proof: DuckDB's `//`
    * and Spark's `div` are only guaranteed to agree away from negative
    * operands, so the sign is factored out).
    *
    * Intermediates are lambda-bound (single-element-transform let, the
    * rowSigS discipline) so the ppm array is computed once per row, not
    * once per reference.
    */
  // float components convert to double BEFORE the ppm multiply (the
  // conversion is exact; float arithmetic would round differently than
  // the oracle's double path)
  private def ppmS(vec: String): String =
    s"transform($vec, x0 -> cast(floor(cast(x0 as double) * 1000000) as bigint))"

  def int8QuantS(vec: String): String = {
    val scale = "greatest(aggregate(vp, 0L, (a0, x1) -> greatest(a0, abs(x1))), 1L)"
    val codes = "transform(vp, x2 -> IF(x2 < 0, -((-x2 * 127) div m0), (x2 * 127) div m0))"
    s"element_at(transform(array(${ppmS(vec)}), vp -> " +
      s"element_at(transform(array($scale), m0 -> $codes), 1)), 1)"
  }

  /** Per-vector quantization scale (max |component| in ppm) — stored
    * alongside the int8 codes so scoring can dequantize.
    */
  def int8ScaleS(vec: String): String =
    s"greatest(aggregate(${ppmS(vec)}, 0L, (a0, x1) -> greatest(a0, abs(x1))), 1L)"

  /** Exact top-k over the QUANTIZED corpus: integer code dot product
    * dequantized by the two vectors' scales — score = (q·q') × m1 × m2,
    * a pure-integer monotone estimate of the float dot product (codes
    * ≤ 127, dims ≤ 64, scales ≤ ~1e6 ppm keep the product inside a
    * Long). The query set broadcasts; the corpus is scanned once with
    * per-row quantization — at scale the codes would be PRE-quantized at
    * rest (4x smaller scan) and this operator reads them directly.
    */
  def int8Knn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"),
        expr(int8QuantS(vecCol)).as("qq"), expr(int8ScaleS(vecCol)).as("qm")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        expr(int8QuantS(vecCol)).as("nq"), expr(int8ScaleS(vecCol)).as("nm"))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qq, nq, (a1, b1) -> a1 * b1), 0L, (s1, v1) -> s1 + v1) * qm * nm"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Random-hyperplane LSH bucket id (nBits bits). Hyperplane j component i
    * is a deterministic pseudo-random value in [-0.5, 0.5):
    * ((j*dim+i)*2654435761 mod 1000003)/1000003 - 0.5.
    *
    * The components are computed ONCE, driver-side, and emitted as array
    * LITERALS: higher-order functions are not constant-folded by Catalyst,
    * so the previous `transform(sequence(...))` form re-derived every
    * component for every row × bit — interpreted O(nBits×dim) modular
    * arithmetic per row. The literal array leaves only the zip/fold dot
    * product per row. `java.lang.Double.toString` round-trips exactly, so
    * the parsed literals are bit-identical to the old per-row computation
    * and bucket assignments (and the ext_knn_lsh oracle hash) are
    * unchanged.
    */
  def hyperplane(j: Int, dim: Int): IndexedSeq[Double] =
    (0 until dim).map { i =>
      ((j.toLong * dim + i) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
    }

  def lshBucket(vec: Column, dim: Int = 64, nBits: Int = 4): Column =
    (0 until nBits).map { j =>
      when(VecDot.of(vec, typedLit(hyperplane(j, dim).toSeq)) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF cell centroid c, component i — deterministic pseudo-random in
    * [-0.5, 0.5), emitted as a driver-side literal array exactly like
    * [[hyperplane]]. Production IVF trains centroids with k-means; the
    * expensive parts at 100 TB — the assignment scan and the probe join —
    * are identical either way, so the centroid table is a pluggable
    * constant here (swap in trained centroids without touching the plan).
    */
  def ivfCentroid(c: Int, dim: Int): IndexedSeq[Double] =
    (0 until dim).map { i =>
      (((c.toLong * dim + i) * 40503L + 1299721L) % 1000003L).toDouble / 1000003.0 - 0.5
    }

  /** The default (untrained) centroid table: pseudo-random literals. Swap
    * for [[KMeans.train]] output via the `*Of` forms / `ivfKnnWith`.
    */
  def defaultCentroids(dim: Int, nCells: Int): Seq[Seq[Double]] =
    (0 until nCells).map(c => ivfCentroid(c, dim).toSeq)

  /** (negdot, cid) score structs against an EXPLICIT centroid table —
    * array_min/sort over these yields "max inner product, ties to the
    * lower cell id". Centroids ride as driver-side literals (control-plane
    * sized: nCells × dim doubles), so assignment stays scan-side.
    */
  private def cellScoresOf(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.zipWithIndex.map { case (ct, c) =>
      struct(
        (-VecDot.of(vec, typedLit(ct))).as("negdot"),
        lit(c.toLong).as("cid"))
    }: _*)

  /** IVF cell assignment against an explicit centroid table. */
  def ivfCellOf(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(cellScoresOf(vec, centroids)).getField("cid")

  /** The nprobe nearest cells against an explicit centroid table. */
  def ivfProbesOf(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    transform(
      slice(array_sort(cellScoresOf(vec, centroids)), 1, nprobe),
      s => s.getField("cid"))

  /** IVF cell assignment: the centroid with the max inner product (ties to
    * the lower cell id). Scan-side: nCells codegen'd dot folds per row,
    * no shuffle.
    */
  def ivfCell(vec: Column, dim: Int = 64, nCells: Int = 8): Column =
    ivfCellOf(vec, defaultCentroids(dim, nCells))

  /** The nprobe nearest cells for a query vector (array of cell ids, best
    * first).
    */
  def ivfProbes(vec: Column, nprobe: Int, dim: Int = 64, nCells: Int = 8): Column =
    ivfProbesOf(vec, defaultCentroids(dim, nCells), nprobe)

  /** IVF ANN: corpus vectors are assigned to their nearest-centroid cell
    * scan-side; each query probes its `nprobe` nearest cells and scores
    * exact cosine against ONLY those cells' members. The probe join is an
    * equi-join on the cell id — the corpus shuffles (or at scale: is
    * pre-partitioned/bucketed) by cell, never broadcast or paired all-to-all.
    * This is the second scale path next to [[lshKnn]]: LSH buckets by
    * random projections (no training, fixed recall), IVF by centroid cells
    * (trainable, recall tuned via nprobe).
    */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int = 64,
      nCells: Int = 8,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfKnnWith(corpus, queries, k, defaultCentroids(dim, nCells), nprobe, idCol, vecCol)

  /** [[ivfKnn]] against an explicit centroid table (e.g. [[KMeans.train]]
    * output) — the trained-IVF form. Plan is identical to the untrained
    * path: centroids are literals, assignment scan-side, probe join
    * equi-keyed on the cell id.
    */
  def ivfKnnWith(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: Seq[Seq[Double]],
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && centroids.map(_.size).distinct.size == 1,
      "centroids must be a non-empty table of equal-dimension vectors")
    // null embeddings would null-poison every cell dot and win the struct
    // argmin (nulls order first) — they can't be neighbors, drop them here
    val cb = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .withColumn("cell", ivfCellOf(col("nv"), centroids))
      .withColumn("nnorm", norm(col("nv")))
    val qb = broadcast(queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(ivfProbesOf(col("qv"), centroids, nprobe)))
      .withColumn("qnorm", norm(col("qv"))))
    val scored = cb.join(qb, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** ANN: top-k within the query's LSH bucket only (plus guaranteed
    * fallback to fewer results when the bucket is small — the standard
    * recall/latency trade).
    */
  def lshKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int = 64,
      nBits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .withColumn("bucket", lshBucket(col("nv"), dim, nBits))
      .withColumn("nnorm", norm(col("nv")))
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dim, nBits))
      .withColumn("qnorm", norm(col("qv"))))
    val scored = cb.join(qb, "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** kNN LABEL-CONSISTENCY evaluation — the standard "is this embedding
    * space any good" probe a training pipeline runs before trusting
    * embeddings for SemDeDup / clustering / mixture decisions: for probe
    * vectors with known labels, the majority label of the k nearest
    * neighbors should be the probe's own label. Accuracy collapsing
    * means the space does not cluster semantically and every
    * embedding-driven operator downstream is firing on noise.
    *
    * Takes ANY family member's top-k output (`knn`: query_id,
    * neighbor_id, ...), so the same report runs against brute force, LSH,
    * IVF, or PQ — composes with [[knnRecall]] (recall measures index
    * faithfulness; this measures the SPACE). Majority vote ties break to
    * the smaller label (total order). Output per label: (true_label,
    * n_queries, n_predicted, n_correct, accuracy_ppm); queries with no
    * neighbors count predicted=0 and incorrect — visible, never silently
    * dropped.
    *
    * Scale shape: `knn` is |queries|×k rows; the only corpus-sized touch
    * is the fixed-width (id, label) projection joined to neighbor ids.
    * Votes, the per-query argmax window, and the label rollup all run on
    * model-sized frames.
    */
  def knnLabelEval(
      knn: DataFrame,
      corpusLabels: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    require(corpusLabels.columns.contains(labelCol) && queries.columns.contains(labelCol),
      s"corpusLabels and queries must carry '$labelCol'")
    val votes = knn
      .join(corpusLabels.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("__nl")), "neighbor_id")
      .groupBy("query_id", "__nl").agg(count(lit(1)).as("__v"))
    val w = Window.partitionBy("query_id").orderBy(col("__v").desc, col("__nl"))
    val pred = votes.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("query_id"), col("__nl").as("__pred"))
    queries.select(col(idCol).as("query_id"), col(labelCol).cast("long").as("true_label"))
      .join(pred, Seq("query_id"), "left")
      .groupBy("true_label")
      .agg(count(lit(1)).as("n_queries"),
        count(col("__pred")).as("n_predicted"),
        sum(when(col("__pred") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("true_label"), col("n_queries"), col("n_predicted"), col("n_correct"),
        expr("n_correct * 1000000 DIV n_queries").as("accuracy_ppm"))
  }

  /** IVF CELL PURITY — does the coarse quantizer respect semantics?
    * Per cell: member count, the dominant label, and its share
    * (purity_ppm). Low purity means the router splits semantic
    * neighborhoods across cells, which silently caps both IVF recall
    * (neighbors live behind unprobed cells) and SemDeDup (near-dups
    * never meet inside a cell) — this is the number that says whether
    * centroids need retraining BEFORE recall regressions show up
    * downstream. Ties break to the smaller label.
    *
    * Scale shape: assignment is the scan-side [[ivfCellOf]] argmax (no
    * shuffle); then one (cell, label)-keyed count and a window over the
    * |cells|×|labels| aggregate — the corpus shuffles once, as
    * fixed-width (cell, label) rows.
    */
  def cellPurity(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(corpus.columns.contains(labelCol), s"corpus must carry '$labelCol'")
    val counts = corpus.where(col(vecCol).isNotNull)
      .select(ivfCellOf(col(vecCol), centroids).as("cell"),
        col(labelCol).cast("long").as("__l"))
      .groupBy("cell", "__l").agg(count(lit(1)).as("__c"))
    val tot = counts.groupBy("cell").agg(sum(col("__c")).as("n_vecs"))
    val w = Window.partitionBy("cell").orderBy(col("__c").desc, col("__l"))
    counts.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .join(tot, "cell")
      .select(col("cell").cast("long").as("cell"), col("n_vecs"),
        col("__l").as("dominant_label"), col("__c").as("n_dominant"),
        expr("__c * 1000000 DIV n_vecs").as("purity_ppm"))
  }

  // ------------------------------------------------------------------ PQ

  /** Product-quantization geometry: 64-dim vectors split into [[PQ_M]]
    * subspaces of [[PQ_SUBDIM]] dims; each subspace has a [[PQ_KSUB]]-entry
    * codebook, so a vector stores as 8 four-bit codes — 32 bytes of float32
    * per subspace collapse to half a byte. PQ completes the ANN family's
    * compression axis: LSH buckets (no training), IVF cells (trainable
    * routing), int8 (4× memory), PQ (64× memory, table-lookup scoring).
    */
  val PQ_M = 8
  val PQ_SUBDIM = 8
  val PQ_KSUB = 16

  /** FROZEN TRAINED IVF centroids — [[KMeans.train]] run once over the
    * sf0.01 `embeddings` corpus (8 cells, 3 Lloyd rounds, via
    * [[TrainIvfTool]]) and baked as a literal: the [[refPqCodebooks]] /
    * [[graft.pipeline.Bpe.refTrainedMerges]] discipline completing the
    * train→freeze→serve→measure loop for the IVF coarse quantizer.
    * Training is deterministic (hash-seeded init, 1e-6-rounded means),
    * so PipelineOpsSpec can assert this table equals a fresh train on
    * the same corpus; `Double.toString` round-trips exactly, so the
    * parsed literal is bit-identical to the trained model and the DuckDB
    * oracle folds the same values.
    */
  val refIvfCentroids: Seq[Seq[Double]] = Seq(
    Seq(0.025416, 0.040068, 0.008489, 1.16E-4, -0.011068, 0.019375, 0.063418, 0.021082, 0.01399, -0.057459, 0.076434, -0.006983, 0.009293, -0.013321, 0.015576, 0.038556, 0.052695, 0.040208, -0.039346, -0.035976, -0.023297, -0.020578, 0.013782, -0.001794, -0.017992, 0.022205, -0.027033, 0.014803, 0.038176, 0.021163, 0.0578, -0.01591, 0.005221, 0.012709, -0.030898, 0.010246, -0.045167, -0.026724, 0.014747, 0.020969, -0.00447, -4.76E-4, -0.039095, -0.045231, -0.022134, -0.005039, 0.029025, 0.028119, -0.001209, -0.009864, -0.035575, 0.024908, -0.049172, -0.026929, 0.033143, 0.002092, -0.033422, -0.022961, -0.025456, -0.081535, -0.027706, -0.05005, 0.012103, -0.051374),
    Seq(0.021616, -0.012101, -0.019465, 0.029743, 0.048977, 0.005254, -0.049333, -0.020234, -0.019128, -0.042929, 0.016902, -0.016473, -0.016748, 0.022514, 0.008958, -0.010403, 0.026869, 0.040482, -0.001855, -0.036829, 0.028741, 0.051574, 0.063511, -0.103412, -0.029494, -0.024909, 0.042019, 0.042231, -0.0452, -3.52E-4, 0.029624, -0.048081, -0.032768, -0.016531, 0.021364, 0.025572, 0.061666, 0.007157, 0.029054, 0.061703, 0.013662, 0.029604, 0.032749, -0.031744, -0.024182, -0.010035, -0.027262, 0.013549, -0.01396, 0.025947, -0.01458, -0.034295, 0.012086, 0.016124, 0.014281, 0.001171, -0.015271, -0.025422, 4.25E-4, 0.032751, -0.02262, 0.034163, 0.042801, -0.02009),
    Seq(0.0022, -0.031406, 0.033996, 0.00513, 0.003798, -0.071157, -0.020485, 0.080152, -0.029182, 0.059571, -0.006797, 0.002988, 0.062544, 0.03555, 0.010051, 0.010726, -0.03241, -0.016341, -0.040369, 0.030728, 3.28E-4, -0.024727, 0.019958, 0.01243, 0.015524, 0.006077, -0.042073, 0.022506, -0.027661, 0.059067, 0.016415, -0.0255, 0.05867, 0.064388, 0.024968, 1.21E-4, -5.34E-4, 0.023535, -0.017939, -0.00152, -0.038805, -0.013336, -0.023266, 0.03025, -0.031945, -0.012015, -0.051243, 0.0136, 0.007622, -0.029655, 0.090571, 0.043428, 0.019562, 0.020724, 0.004678, -0.014034, -0.003802, -0.036403, -0.02263, 0.006048, -0.0069, -0.016733, -0.00552, -0.06576),
    Seq(-0.053346, -0.03318, 0.045832, 0.00839, -0.023717, 0.044139, -0.021162, 0.023821, -0.012707, 0.056596, -0.065023, 0.023523, 0.020391, -0.08261, 0.01174, 0.011565, 0.036574, -0.004172, 0.020043, 0.008526, -0.03816, -0.003632, -0.01249, -0.014059, 0.003506, 0.074979, 0.031871, -0.008132, 0.019109, -0.074965, -0.040279, 0.027085, 0.030081, -0.007178, 0.001341, 0.053545, -0.035803, -0.049778, -0.008251, -0.028739, 0.047141, -0.014052, 0.014987, 0.048504, -0.030787, -0.026024, 0.005208, 0.037024, -0.045564, -0.026101, -0.036302, 0.002355, 0.03177, 4.89E-4, 0.009483, 0.033827, 0.032044, 0.05499, -0.02229, -0.03405, -0.056956, 0.032413, -0.040665, 0.00423),
    Seq(0.02234, 0.00147, -0.042381, -0.009924, 0.013215, 0.018387, -0.051204, 0.009241, 0.026798, -0.009992, -0.015727, 0.041186, -0.039659, 0.045068, 0.001503, -0.028567, -0.019562, -0.062124, 0.012103, -0.03196, -0.034805, 0.056839, -0.001589, 0.043935, 0.045659, 0.080947, 0.057027, -0.022579, -0.001764, -0.023459, 0.009893, 0.071587, -0.048064, -0.025212, 0.003099, -0.023433, -0.037232, 0.059387, -0.011603, -0.028415, -0.050665, -0.041343, -0.04947, 0.011545, -0.011878, 0.024575, 0.019627, -0.018593, -0.019914, -0.004694, 0.014861, 0.021093, -0.02604, -0.004568, -0.052623, -0.001309, 0.047939, 0.017917, 0.01273, 0.019977, 0.030268, -0.029774, -0.017827, -0.023596),
    Seq(4.0E-4, 0.001375, 0.021102, -0.014179, 0.025015, 0.014476, -0.01678, 0.007767, 0.017536, -0.040138, 0.046871, -0.041368, 0.014818, -0.01716, -0.022583, 0.027015, -0.045581, 0.02883, 0.034248, 0.051562, 0.010016, -0.023911, -0.034351, 0.002774, -0.063792, 0.057987, -0.020507, 0.018965, 0.027884, 0.05763, -0.057747, -0.031383, 0.020909, -0.018775, 0.008484, -0.046447, -0.024583, -0.03012, -0.02604, 0.036854, 0.022677, -0.073761, 0.022118, -0.014095, 0.023517, 0.032506, -0.005431, -0.005387, 0.023878, 0.020658, 0.027737, -0.064036, 0.014515, -0.030367, -0.016866, -0.046919, 0.037288, 0.015619, 0.055031, -0.01148, 0.04184, 0.032606, -0.051421, -0.002257),
    Seq(5.67E-4, -0.032328, 0.008608, -0.034142, -0.03494, -0.018854, 0.018576, -0.059351, -0.008174, 0.008708, -0.003162, -0.009389, -0.073034, 0.005499, -0.03543, -0.009913, 0.041741, 0.006343, -0.002355, 0.051884, 0.003523, 0.032743, -0.033184, 0.065993, 0.009199, -0.064826, -0.027774, 0.007543, -0.025796, -0.026452, -0.025608, 0.012101, 0.014533, -0.064997, 0.021909, 0.018178, 0.029244, -0.016995, 0.01583, -0.005368, 0.008057, 0.053488, 0.051485, -0.02394, 0.023426, 0.033453, 0.052836, -0.028525, -0.033306, -0.024051, 0.019466, 0.032592, 0.087031, -0.06207, 0.026459, -0.012581, -0.002909, -0.025683, 0.020946, -0.018132, 0.004928, 0.032266, 0.022091, 0.022606),
    Seq(-0.009922, 0.034184, -0.026149, -0.036409, 0.049917, 0.06941, -0.060883, -0.012827, -0.008804, 0.025509, -0.003224, 0.039001, -0.020705, 0.007397, 0.002356, 0.009121, -0.017188, 0.021055, 0.020047, -0.025639, 0.024352, -0.056871, 0.005786, -0.066092, 0.028632, -0.079384, -0.035911, 0.004819, 0.011836, -0.03543, 0.055523, -0.033496, 0.021623, -0.018461, -0.014877, -0.021979, 0.01383, 0.007771, 0.003096, -0.084946, 7.17E-4, -0.020245, 0.007268, 0.017857, -0.010943, -0.004463, -0.008446, 0.003988, 0.051565, -0.045819, -0.009084, -0.038558, -0.016606, 0.048238, 0.03434, 0.017114, -0.033185, 0.006644, -0.067023, 0.005451, 0.034695, 0.013879, 0.039711, 0.056992))

  /** FROZEN reference PQ codebooks — per-subspace Lloyd output (3 rounds)
    * over a synthetic embeddings snapshot, baked as a literal the same way
    * [[graft.pipeline.Bpe]] bakes its merge table: the correctness oracle
    * must evaluate the IDENTICAL codebook in SQL, and k-means training is
    * not replayable there. Production pipelines train fresh codebooks with
    * [[pqTrain]]; this table only anchors the cross-engine gate and the
    * default for the incremental semantic-dedup query.
    */
  val refPqCodebooks: Seq[Seq[Seq[Long]]] = Seq(
    Seq(Seq(18913L, 33482L, -4140L, -173607L, 117791L, -34696L, -27889L, -54943L), Seq(-39388L, -50995L, 16340L, -50214L, -99272L, -55322L, -94626L, 32383L), Seq(-24733L, 19032L, -73031L, 114795L, -80646L, 44361L, 61463L, 114451L), Seq(-128972L, -4967L, 41656L, -10856L, 74951L, 16597L, 124631L, -48377L), Seq(-35591L, 8095L, 40038L, 2326L, -9150L, -185903L, 144898L, 104341L), Seq(-33038L, -111614L, 121322L, 32044L, 117498L, -129024L, -103168L, 122785L), Seq(-27627L, 121584L, 80013L, -89055L, -112251L, 127494L, 1553L, -14847L), Seq(221843L, 14156L, 46154L, -40500L, -15799L, -44246L, 19844L, 98227L), Seq(-91623L, -187245L, 17644L, -6018L, -17852L, 134517L, -121107L, 41400L), Seq(110063L, -139803L, -12547L, 3927L, -3822L, 111736L, -16298L, -88349L), Seq(69414L, -6634L, -185210L, 6198L, -25124L, 39713L, 19907L, -91301L), Seq(-81817L, 26932L, -49017L, 35689L, 56782L, 26081L, -149892L, -161737L), Seq(2620L, 9806L, 100707L, 2968L, 146992L, 200018L, -145770L, -7397L), Seq(69611L, 39574L, 55305L, 150715L, 55915L, -8576L, -61082L, -17553L), Seq(10015L, -31364L, -60265L, -76333L, 100179L, 26296L, -75256L, 149484L), Seq(-55359L, 59100L, 16194L, 40326L, -159070L, -196108L, -47202L, -91479L)),
    Seq(Seq(165410L, 21270L, -28275L, 36375L, -141559L, -48548L, -10401L, -36723L), Seq(-72699L, 109933L, -83430L, 126063L, 88009L, -81814L, 54009L, -35146L), Seq(-98348L, -128785L, 8812L, 9795L, -88733L, 91654L, 35382L, 112223L), Seq(-84616L, 20285L, -89702L, 60892L, 84352L, 232891L, 16249L, -1233L), Seq(-14635L, 128442L, 153877L, 5655L, 280L, 8540L, 112113L, -78572L), Seq(-93843L, 50700L, 114578L, 142282L, -26506L, -36954L, -125220L, -4539L), Seq(37174L, 230201L, 61024L, 38506L, -92429L, 162689L, -22290L, -5576L), Seq(-77333L, -115904L, 48597L, -33108L, -99890L, -45076L, 69345L, -149931L), Seq(-9510L, 68705L, -103053L, 47341L, 14693L, 13546L, -57815L, 164181L), Seq(-76174L, 51745L, -19716L, -96308L, -156833L, -11313L, -117041L, -33265L), Seq(40905L, -79207L, -63968L, -87409L, 41147L, -120935L, -5594L, -3920L), Seq(39838L, 36074L, 82790L, -123868L, 90219L, 56350L, -94844L, 47332L), Seq(81569L, -96499L, 49285L, 39394L, 74308L, 51129L, 102944L, 89502L), Seq(-23747L, -59859L, 176212L, -123725L, 43217L, -193152L, -45103L, 61412L), Seq(121589L, 131712L, -59869L, -6906L, 96299L, -59611L, 188555L, -17560L), Seq(-37565L, -155578L, -33827L, 29756L, -5410L, 72022L, -84517L, -148116L)),
    Seq(Seq(24623L, 62474L, -43439L, 125972L, -129178L, -57726L, 43468L, -109637L), Seq(-42244L, 4987L, 71735L, -139761L, 41508L, 173042L, 56369L, -83017L), Seq(-185679L, 10197L, -61100L, -202366L, 170652L, 51942L, 214001L, -103071L), Seq(23952L, -65726L, -80968L, 103103L, 95464L, -26520L, -46604L, 20203L), Seq(19769L, 190866L, -12335L, -23148L, 21917L, 68751L, -58481L, 779L), Seq(195818L, -68994L, 1242L, 15906L, -61852L, -108805L, 19901L, 141562L), Seq(-36583L, 156888L, -60052L, -75864L, 31066L, -134005L, -3355L, -41066L), Seq(64985L, 1532L, -105740L, 91979L, -16542L, 108669L, 85313L, 4422L), Seq(47877L, -59267L, 132374L, 44813L, 74378L, -27918L, 106868L, -24547L), Seq(8813L, 51940L, 47736L, -95788L, 388L, 61970L, 108090L, 238235L), Seq(13053L, 98190L, 73127L, -74774L, -169289L, 66049L, -220L, -12832L), Seq(159970L, -16395L, -18540L, -107019L, -61422L, -83172L, 103471L, -49246L), Seq(-81701L, -131642L, -110158L, -72975L, -26747L, 57786L, -20543L, -16887L), Seq(53494L, 44847L, 84426L, -31842L, 132819L, 11816L, -14353L, -239191L), Seq(5132L, -70209L, 98369L, 11460L, 20110L, -58716L, -137224L, 69946L), Seq(-162016L, 37108L, 36994L, 62154L, -28001L, -52316L, -5121L, -13275L)),
    Seq(Seq(34024L, 166516L, 133029L, 23308L, 28362L, 49729L, -5353L, 176190L), Seq(89871L, 76814L, -75749L, -22854L, 8434L, 170884L, -75499L, 52985L), Seq(-39912L, -67889L, -66798L, -77379L, 39005L, 85836L, -42074L, -131575L), Seq(-67515L, -25598L, 22819L, -114613L, -127722L, -49168L, -67960L, 25885L), Seq(-12295L, -80228L, 161674L, -33960L, 73695L, 13921L, 95736L, 15134L), Seq(150419L, 65980L, 377L, -54632L, 68059L, 71986L, 94083L, -125786L), Seq(-48763L, -127454L, 23947L, 118435L, 54960L, -5106L, 20663L, -45066L), Seq(54640L, -96857L, -100665L, 14796L, -42702L, 64174L, 127102L, 100278L), Seq(-81329L, 126048L, -16475L, -15939L, 60212L, -279099L, 23009L, -46493L), Seq(-19379L, -65936L, -103967L, 82232L, -63586L, -104876L, 17201L, -151209L), Seq(65972L, 75532L, -103482L, 179129L, -57555L, 20191L, -112064L, -22076L), Seq(107800L, 100557L, 67609L, 29864L, -110205L, -16792L, -33450L, 43934L), Seq(-55389L, 225382L, -54604L, 11817L, 9598L, -73393L, 79260L, -86298L), Seq(53888L, -11071L, 29093L, 34988L, 82126L, -120326L, -69856L, 64640L), Seq(-178794L, 55180L, -28177L, -17469L, 56458L, 84952L, -62262L, 47469L), Seq(-66647L, 20381L, 16938L, 28040L, -145254L, -36969L, 168097L, -70758L)),
    Seq(Seq(-176018L, -149308L, 6480L, 73200L, -16801L, -12407L, -34L, 41307L), Seq(2255L, -50320L, -38665L, 79012L, -53627L, -75508L, 62040L, -156100L), Seq(40756L, 634L, -81265L, 133539L, 91664L, 63239L, 91993L, 37319L), Seq(181169L, -1128L, -73803L, -49148L, -12195L, -47228L, 38798L, -92435L), Seq(-130539L, 24167L, -17345L, -97780L, -83948L, 55239L, -64273L, -76166L), Seq(-10788L, -24012L, 14342L, 132336L, -6462L, 80007L, -146087L, -1402L), Seq(-95659L, -100602L, -65243L, 35457L, 186746L, 111063L, 6701L, 45293L), Seq(-55459L, -63355L, -42842L, -764L, -40793L, -150047L, 54117L, 145499L), Seq(-5477L, -47521L, 125135L, -55949L, 75719L, -14799L, 112472L, -55313L), Seq(-33547L, -9178L, 108742L, 94744L, -251803L, -59311L, 126159L, 47286L), Seq(144349L, -111832L, 63530L, -529L, 52844L, 39923L, 1729L, 84817L), Seq(35025L, -96676L, -53674L, -100669L, 42362L, -88533L, -135570L, 40723L), Seq(6550L, 103046L, -50457L, -46257L, -70949L, 57315L, -901L, 151274L), Seq(82034L, 111554L, 90373L, 7687L, -31914L, 160120L, 21677L, -21046L), Seq(54283L, 156951L, 30749L, 37527L, 82296L, -139953L, -110842L, -46936L), Seq(57700L, 17307L, 65919L, -180995L, -93431L, -118824L, 88241L, -38961L)),
    Seq(Seq(-3612L, 13890L, -61727L, 45474L, -10014L, 151816L, 74357L, -90297L), Seq(33826L, -75849L, 187092L, 26921L, 60384L, 40576L, -15431L, -126857L), Seq(-24153L, 18332L, 139508L, 30367L, -167258L, 66444L, -93054L, -48223L), Seq(-62842L, -94763L, -90024L, 65522L, 84097L, 64464L, -88426L, -36695L), Seq(-5790L, 40165L, -168018L, -54830L, 8297L, 31172L, -118544L, 148368L), Seq(-73563L, 97721L, -115247L, 20587L, -140673L, -51814L, 44714L, 10159L), Seq(150853L, -78398L, -11855L, -87312L, 16402L, 65965L, 66651L, 112388L), Seq(-104627L, -108571L, 29729L, 72795L, -32941L, 39335L, 28365L, 128566L), Seq(-36543L, -86653L, -54720L, 16828L, 82720L, -101588L, 95639L, -77922L), Seq(138157L, 46897L, 92268L, 96194L, -126069L, 8219L, 66841L, -79590L), Seq(-21494L, -213842L, -43949L, -95509L, -57733L, -44342L, 16332L, -94798L), Seq(88037L, 3183L, -16363L, -144148L, 43302L, -74390L, -122155L, -5981L), Seq(65391L, 24069L, -30489L, 148209L, 36832L, -47002L, -53455L, 68379L), Seq(-78407L, -17643L, -24964L, -162507L, -126663L, 9904L, -95086L, 8101L), Seq(-25197L, 79086L, 103559L, -66232L, -44651L, -175409L, 66302L, 27571L), Seq(-68785L, 172365L, 28387L, -56108L, 102401L, -15141L, 31601L, 77588L)),
    Seq(Seq(43773L, -138760L, -45091L, 141719L, 72845L, -78928L, 58420L, -22297L), Seq(-36248L, -191768L, 47794L, 5346L, 11564L, 96642L, 9019L, 117149L), Seq(58084L, 15246L, 109154L, -84386L, -17529L, -88416L, 116299L, 204309L), Seq(233926L, -194978L, 10472L, -49790L, 8917L, 97041L, -88924L, 13309L), Seq(-52793L, -25360L, 38324L, 52952L, 22454L, 140798L, 102230L, -26369L), Seq(25126L, 262L, 111915L, 31512L, -18982L, 57574L, -134774L, -172626L), Seq(25142L, 11693L, -115838L, 92778L, -15504L, -20118L, -33588L, 128013L), Seq(-25205L, -10755L, 140354L, 64281L, 32173L, -66925L, -69556L, 87362L), Seq(-149240L, 18397L, -13725L, 62439L, -145107L, 73310L, -59099L, -124373L), Seq(58897L, -58952L, 84998L, -127328L, -149477L, 22638L, -16854L, 31262L), Seq(83344L, 132317L, 81245L, -38373L, 113120L, -22874L, 12449L, -18053L), Seq(82309L, 53805L, -115115L, -127627L, 2503L, 50760L, 89524L, -721L), Seq(-142041L, 29675L, -22119L, -21358L, 165102L, 4962L, -73617L, -17873L), Seq(-129381L, -102919L, -96930L, -63249L, -41066L, -60050L, -33174L, -8968L), Seq(-72471L, 16804L, 65512L, 68513L, 6120L, -114611L, 125188L, -17693L), Seq(50653L, 37197L, -33123L, -58025L, -42752L, -131832L, -32044L, -144733L)),
    Seq(Seq(-34998L, -95362L, -116385L, -71203L, -75719L, -33812L, 74444L, -176262L), Seq(43121L, -61659L, -5118L, 94636L, -100731L, 51228L, -89731L, -85064L), Seq(64506L, -94395L, -3230L, 103233L, 20366L, 154828L, 74566L, 780L), Seq(-83557L, -58667L, -29471L, -121636L, 98302L, -55107L, -25529L, -70662L), Seq(95948L, -128824L, -14882L, -76805L, -17303L, -5638L, 83681L, 99862L), Seq(-70343L, 50635L, -4433L, 12714L, -151253L, 56574L, -31083L, 102588L), Seq(-101747L, 51689L, 5880L, 32892L, 79623L, 4551L, 173364L, 26412L), Seq(2897L, 124121L, -181815L, -88384L, 40932L, 53336L, -58274L, -86693L), Seq(-87037L, 64315L, 88368L, -117154L, -81329L, -104185L, 43147L, 19284L), Seq(27189L, 18253L, 39363L, -136433L, 15063L, 131810L, -6550L, -21155L), Seq(137413L, 66314L, 25483L, 37768L, 113194L, -118313L, -46737L, 57549L), Seq(-31566L, 106353L, -97906L, 6501L, 132494L, 21167L, -70035L, 184605L), Seq(24606L, -91964L, 160682L, -18575L, 114791L, 55449L, -117350L, -87153L), Seq(-127499L, 42518L, 31964L, 138225L, 51469L, -6795L, -139667L, -17247L), Seq(-1510L, 8008L, -182470L, 92057L, 3528L, -93434L, 78931L, 3445L), Seq(71904L, 84883L, 119898L, 52992L, -86521L, -40082L, -38569L, -100275L)))

  /** FROZEN TRAINED RESIDUAL codebooks — [[pqTrainResidual]] run once
    * over the sf0.01 `embeddings` corpus against [[refIvfCentroids]] (8
    * Lloyd rounds, via [[TrainResidualPqTool]]) and baked as a literal:
    * the [[refPqCodebooks]] discipline for the residual quantizer, so the
    * DuckDB oracle folds the identical integers and PipelineOpsSpec can
    * assert the literal equals a fresh train on the same corpus.
    */
  val refResidualPqCodebooks: Seq[Seq[Seq[Long]]] = Seq(
    Seq(Seq(12795L, 27785L, 52246L, -3904L, -68112L, -42424L, 249078L, 2495L), Seq(-121206L, -23498L, -11487L, 19557L, 67355L, -145814L, -89071L, -67811L), Seq(-6345L, -7137L, -2317L, 105752L, 105372L, -110212L, 34965L, 101391L), Seq(-16515L, -26160L, 94245L, -38780L, -157286L, 61761L, -10907L, -26416L), Seq(8681L, 112657L, 122347L, 52783L, 73608L, -28529L, 34421L, -69723L), Seq(67900L, -25464L, -67693L, 35135L, -13946L, 23336L, 47503L, -197771L), Seq(163972L, -69734L, -33616L, -70973L, -48802L, -117681L, 1195L, 47379L), Seq(-121462L, -88561L, -95208L, -93934L, 97173L, 58167L, 107538L, -63349L), Seq(71097L, -15933L, 7305L, 80780L, 28380L, 125399L, -164175L, -54442L), Seq(-5776L, -175469L, 11596L, 101297L, -28289L, 56403L, -37307L, 60286L), Seq(-91800L, 124560L, 26445L, -69097L, -104505L, -89191L, 21265L, -23322L), Seq(83876L, -5758L, 215987L, 47808L, -18174L, -84403L, -96679L, 8334L), Seq(-6337L, 83662L, -172285L, 3681L, -84609L, 43182L, 11760L, 78084L), Seq(154219L, 23865L, -20739L, -2388L, 41534L, 61478L, 46475L, 164856L), Seq(-143290L, 64219L, 15093L, 58601L, 25659L, 130648L, 9106L, 31256L), Seq(3446L, 18541L, 33372L, -129288L, 75641L, 4738L, -89461L, 49220L)),
    Seq(Seq(28744L, -24521L, 140454L, 70792L, -80767L, -48497L, 78276L, 88264L), Seq(-43429L, -110738L, 19322L, -33720L, -91773L, -1183L, -45081L, -187676L), Seq(-52297L, 32840L, -103942L, 181292L, 6798L, 19099L, -78736L, -44232L), Seq(-43762L, 190261L, -82630L, -124134L, 8867L, -60885L, -48568L, -31036L), Seq(-28866L, 174388L, 60456L, 82790L, -102715L, 69938L, -69412L, -43851L), Seq(-71781L, 1666L, -1307L, -153794L, -86074L, 1826L, -65938L, 48377L), Seq(194077L, 33078L, -32001L, -21533L, -102145L, -24574L, 2985L, -44212L), Seq(62490L, -94929L, -53944L, 16742L, 32040L, -97926L, 91839L, 21499L), Seq(52480L, -64798L, 62574L, -40140L, 82760L, 13507L, -162400L, 90054L), Seq(-1233L, 39631L, -46031L, 99373L, 82795L, 76830L, -34436L, 140463L), Seq(-4201L, -33738L, -74969L, -70852L, -27194L, 197867L, 76379L, 54451L), Seq(92756L, 127199L, -79080L, 4682L, 162601L, -50595L, 150263L, -21813L), Seq(-34949L, 27934L, 120674L, -96832L, 5736L, -209212L, -23259L, -34350L), Seq(-125955L, -168316L, -61468L, 23380L, 7113L, 18576L, 5517L, 102197L), Seq(-118034L, -44679L, 3263L, 8776L, 99808L, -39972L, 55791L, -150295L), Seq(18071L, 98729L, 138836L, -17640L, 49836L, 31566L, 90724L, -79827L)),
    Seq(Seq(101050L, 75457L, -70148L, -133345L, 86055L, -39882L, 21605L, 80865L), Seq(67953L, -60735L, -43321L, -104343L, -131145L, 8205L, -60416L, -86383L), Seq(13024L, -48767L, -147237L, 85252L, 28654L, 64427L, 94796L, 34155L), Seq(32041L, -65929L, 39598L, -10111L, -129226L, -100410L, 25361L, 126062L), Seq(10604L, 67375L, 118332L, -12926L, -65866L, 129600L, 44096L, 33579L), Seq(-106996L, 135750L, -23655L, 67928L, -21813L, 49141L, -64343L, 10180L), Seq(152340L, -81483L, -57568L, 102553L, 6178L, -50681L, -128708L, -40101L), Seq(-14454L, 212644L, 42622L, -95866L, -34388L, -81661L, -4160L, -16506L), Seq(-128750L, 13237L, 1264L, -150550L, 45863L, 72520L, 115132L, -89570L), Seq(53600L, -55369L, 92041L, 77461L, 60336L, -66912L, 129563L, -24499L), Seq(-117044L, -173970L, -62879L, -41532L, 25180L, 68252L, -61269L, -17306L), Seq(-72902L, 13819L, -67779L, 93381L, -74369L, -109268L, 23331L, -91756L), Seq(89783L, 81521L, 17720L, 3890L, 67836L, 17181L, 20198L, -208587L), Seq(-73797L, -72819L, 127923L, -41685L, 112942L, -113518L, -61373L, -25452L), Seq(29917L, 759L, 66859L, 22990L, 114786L, 30553L, -148975L, 45251L), Seq(8979L, -53416L, 12031L, -43265L, 54912L, 65306L, -6142L, 249330L)),
    Seq(Seq(79729L, 38128L, -60984L, 146774L, 85054L, 56300L, -79623L, -25130L), Seq(-66744L, -46050L, 165879L, -72758L, -77403L, 7659L, -36293L, 122890L), Seq(-12201L, 53191L, -88349L, -123686L, 63432L, 78286L, 40452L, -880L), Seq(-21120L, -45740L, 83177L, -98275L, 95834L, -64564L, 53929L, -111903L), Seq(154094L, 93848L, 104674L, -56825L, 25821L, 103984L, -52234L, -114286L), Seq(-170288L, 81795L, 86466L, 9214L, -2023L, 113457L, -4801L, -5450L), Seq(-62657L, -52278L, -31483L, 80036L, 15806L, -19956L, -113297L, 114884L), Seq(-71644L, -161442L, 9280L, 32830L, 61335L, 37046L, 119910L, 38503L), Seq(-76401L, -6039L, -30399L, 104618L, -119296L, -29219L, 47639L, -121772L), Seq(-125878L, 58136L, -86832L, -24725L, 68258L, -169020L, 6418L, -71291L), Seq(73559L, 180358L, 17904L, 26390L, -105925L, -21601L, 72843L, 7523L), Seq(84649L, -40198L, 124832L, 36368L, 58027L, 100566L, 3422L, 88229L), Seq(7284L, -55532L, -57212L, -151660L, -120081L, 22751L, -83519L, -3204L), Seq(41293L, -3826L, -135947L, 34612L, -37841L, 9087L, 45792L, 160129L), Seq(46613L, -21420L, -8625L, 35870L, -89966L, -148044L, -135026L, -47580L), Seq(171893L, -95335L, -40500L, 18318L, -5779L, -29114L, 97300L, -14027L)),
    Seq(Seq(-125308L, -60006L, -27461L, -100682L, 75439L, -185142L, -73122L, 79666L), Seq(48456L, -52226L, 104515L, -4904L, 87L, 14410L, -14167L, 164890L), Seq(69275L, 149062L, 108048L, 17428L, -21046L, 148990L, -2231L, -13583L), Seq(-122054L, -9770L, 84550L, 114909L, -40146L, -87525L, 31772L, 26930L), Seq(-119117L, 80098L, -90076L, -31114L, -36482L, 36037L, -31391L, -11504L), Seq(21764L, -114030L, -119884L, -33840L, -115753L, -191895L, 36356L, 105550L), Seq(22926L, -12526L, -84363L, 184283L, 43128L, -39082L, 80165L, -9656L), Seq(10309L, 6823L, 6651L, 3373L, 77636L, 37514L, -227877L, -19792L), Seq(-51823L, -29246L, 2350L, 59424L, -171915L, 126040L, 37248L, -2753L), Seq(-112423L, -22413L, 140231L, -134864L, -9873L, 17061L, -41263L, -90117L), Seq(88950L, -59683L, 13027L, 23456L, 149949L, 63631L, 54717L, -27845L), Seq(-19078L, -183568L, -109819L, 7288L, -13675L, 36615L, -45112L, 13930L), Seq(71525L, -19359L, -73370L, -133020L, 70700L, -137127L, -84087L, 71785L), Seq(56323L, 174365L, -42572L, -34654L, -9507L, 3888L, 164995L, 68247L), Seq(81007L, 96803L, 15033L, 10405L, 27114L, -104553L, -32766L, -123945L), Seq(99121L, -75796L, -11782L, -177480L, -47324L, -15896L, 128846L, -30969L)),
    Seq(Seq(20361L, 121815L, 88793L, -7238L, 72981L, -85100L, 132553L, -66506L), Seq(70961L, -128627L, -24884L, 82088L, -106569L, 77133L, 69892L, 59815L), Seq(-110035L, -9811L, -33776L, -147715L, -48723L, 21079L, -123930L, -38162L), Seq(99515L, -54353L, -33135L, 130432L, 96607L, -83335L, 60238L, -87901L), Seq(-128720L, -45759L, 1922L, 44727L, 9826L, -4946L, 5449L, 145001L), Seq(30705L, -24875L, 43748L, 161644L, 48896L, 107666L, -93838L, 71867L), Seq(2878L, -94110L, 102454L, -101237L, 131764L, -10554L, 1778L, 35266L), Seq(117115L, -29121L, 26149L, -117273L, -65589L, -124299L, -24096L, 80L), Seq(-128277L, -62378L, 193100L, 66126L, -63867L, 36742L, -14499L, -5778L), Seq(-63253L, -94040L, -108592L, -17229L, 13329L, -82915L, 35499L, -122111L), Seq(20918L, 78086L, 143524L, 11559L, -158310L, 22913L, -62230L, -123412L), Seq(38531L, 19974L, -42013L, 55260L, -60781L, 146572L, 74607L, -135631L), Seq(-47827L, 131320L, -76578L, -8574L, -85800L, -109943L, 12270L, 51113L), Seq(69754L, 59555L, -23224L, 4227L, 46700L, 27952L, -142653L, -40119L), Seq(-68293L, 132070L, -93338L, -554L, 136787L, 45024L, 28610L, 90980L), Seq(115555L, -41642L, -88668L, -120908L, 22397L, 88207L, 17009L, 129113L)),
    Seq(Seq(39704L, 16107L, -16232L, -152949L, -154178L, -10410L, 61814L, 10325L), Seq(-71148L, 37010L, -35380L, -50885L, 77476L, 131050L, 70308L, -81053L), Seq(28665L, -71432L, 155582L, 7839L, -48606L, -22111L, 80941L, 52526L), Seq(34696L, 135921L, 34715L, 87447L, -34255L, -98448L, -62152L, 14111L), Seq(-67528L, 49111L, -118883L, 63961L, -90991L, -28182L, 121448L, 15202L), Seq(113530L, 94488L, 28873L, -114102L, 11189L, 18021L, -96585L, -32892L), Seq(-45244L, -35239L, 35938L, -69205L, 95830L, -95874L, 20206L, -109552L), Seq(126671L, 47626L, 31614L, 1198L, 44140L, 114492L, 112918L, 71211L), Seq(-31085L, 37698L, 44267L, 9292L, -87792L, 46421L, -115742L, -200671L), Seq(-146360L, -57214L, -13135L, 115294L, -138810L, 107701L, -6942L, 8452L), Seq(-149935L, 90703L, 46820L, 19644L, 85157L, 9651L, -2829L, 108448L), Seq(-45970L, -95779L, 1062L, 137255L, 117197L, -8301L, 5748L, -26065L), Seq(110644L, 113001L, 42174L, 17351L, 198545L, -90566L, 13792L, 77114L), Seq(72417L, -124126L, -71777L, -14134L, -56246L, -158895L, -56087L, -81984L), Seq(187576L, -142131L, -56190L, 46544L, 274L, 40622L, -33849L, 51370L), Seq(-49736L, -90634L, -67180L, -48654L, 20712L, -4859L, -101587L, 112332L)),
    Seq(Seq(-16530L, 29075L, 133370L, 24627L, 26948L, -85658L, 125939L, 84672L), Seq(-58587L, -27936L, -113808L, 136142L, -22231L, -13515L, 147307L, -51559L), Seq(-13047L, 55570L, -12512L, -23242L, 73874L, 161065L, 59363L, -56942L), Seq(9495L, 23276L, -31661L, 5491L, -160809L, -92437L, -29192L, 28605L), Seq(39843L, -23402L, 106331L, 141787L, -86848L, -91374L, 26901L, -120183L), Seq(165651L, -107565L, 27309L, 66072L, 16111L, 32095L, -4129L, 52286L), Seq(-144483L, -53339L, -10277L, -70677L, -26158L, 135354L, 35344L, 58058L), Seq(42725L, -25382L, -169475L, 15003L, 35272L, -87288L, 23110L, 93191L), Seq(-114714L, -65922L, 43958L, -2065L, 59286L, -4150L, -102460L, -105148L), Seq(56358L, 6887L, -4043L, -130502L, 28651L, -83272L, 68253L, -118369L), Seq(-60887L, 75977L, -31827L, 64694L, 90804L, -47845L, -112208L, 151471L), Seq(-8115L, 141757L, -143875L, -133187L, 49204L, -46980L, 19127L, 49837L), Seq(14208L, 20828L, 2480L, 53044L, -107757L, 130439L, -124268L, -62293L), Seq(11686L, -186864L, -25385L, -88020L, 60443L, 39382L, 20270L, 51191L), Seq(-60510L, 79955L, 170787L, -64144L, -111662L, 37287L, -47652L, 73680L), Seq(116668L, 133770L, 75096L, 7624L, 105156L, 52017L, -109015L, -58692L)))

  /** Codebook entry component, ppm-integer — deterministic pseudo-random in
    * [-499991, 499991] (≈ [-0.5, 0.5) in ppm), the [[ivfCentroid]]
    * discipline: production PQ trains codebooks per subspace with k-means
    * (swap trained tables in via the `*With` forms); the scale-critical
    * parts — the one-time encode scan and the LUT-lookup scoring join — are
    * identical either way. All-integer so the oracle hashes exactly.
    */
  def pqCbVal(m: Int, c: Int, i: Int): Long =
    (((m.toLong * PQ_KSUB + c) * PQ_SUBDIM + i) * 48271L + 12345L) % 999983L - 499991L

  /** The default codebook table: codebooks(m)(c) = subvector of ppm ints. */
  def defaultPqCodebooks: Seq[Seq[Seq[Long]]] =
    (0 until PQ_M).map(m => (0 until PQ_KSUB).map(c =>
      (0 until PQ_SUBDIM).map(i => pqCbVal(m, c, i))))

  /** SQL literal for a full codebook table: array<array<array<bigint>>>,
    * indexed cb[m+1][c+1][i+1]. Constant-folded to ONE literal by Catalyst
    * — referencing it inside per-row lambdas costs nothing per row.
    */
  private def pqCbLitS(cbs: Seq[Seq[Seq[Long]]]): String =
    cbs.map(cb => cb.map(v => v.mkString("array(", "L,", "L)"))
        .mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  /** ppm quantization of the float vector (the int8 convention: exact
    * float→double widening, floor — identical in both engines).
    */
  private def pqPpmS(vec: String): String =
    s"transform($vec, x0 -> cast(floor(cast(x0 as double) * 1000000) as bigint))"

  /** PQ ENCODE — array of [[PQ_M]] codes, each the argmin-L2 codebook entry
    * for its subvector (ties to the lower code id via struct ordering).
    * One scan-side expression; the ppm array is lambda-bound (the rowSigS
    * discipline) so it is computed once per row. Pure Long arithmetic:
    * per-component squared diffs ≤ (1.5e6)² ≈ 2.3e12, × 8 components
    * ≈ 1.8e13 — far inside Long.
    */
  def pqCodesS(vec: String, cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks): String =
    pqCodesFromPpmS(pqPpmS(vec), cbs)

  /** [[pqCodesS]] over an ALREADY-ppm array<bigint> expression (the trainer
    * assigns from its staged ppm column — round-tripping ppm→float→ppm
    * through a double division would off-by-one the floor).
    */
  /** In-plan dimension check on a lambda-bound ppm array `vp0`: a vector
    * whose size is not PQ_M×PQ_SUBDIM must FAIL, not mis-encode —
    * out-of-range `element_at` yields NULL, a NULL distance propagates
    * into the argmin struct, and struct ordering ranks the null field
    * FIRST, silently electing garbage codes. The guard feeds the bound
    * variable itself so no rule can prune it (the lineDedup convention).
    */
  private def pqDimGuardS(inner: String): String =
    // the error arm is an array LITERAL of one raise_error — evaluated
    // eagerly when the branch is taken, so even an EMPTY vector raises
    // (a transform-lambda guard would never run its body on size 0)
    s"""element_at(transform(array(IF(size(vp0) = ${PQ_M * PQ_SUBDIM}, vp0,
       |  array(cast(raise_error(concat(
       |    'PQ: vector dimension ', cast(size(vp0) as string),
       |    ' != ${PQ_M * PQ_SUBDIM} — wrong-dimension vectors would silently mis-encode')) as bigint)))),
       |  vp -> $inner), 1)""".stripMargin.replace("\n", " ")

  def pqCodesFromPpmS(ppmExpr: String, cbs: Seq[Seq[Seq[Long]]]): String = {
    val cb = pqCbLitS(cbs)
    val body =
      s"""transform(sequence(0, ${PQ_M - 1}), mi ->
         |    array_min(transform(sequence(0, ${PQ_KSUB - 1}), ci ->
         |      named_struct(
         |        'd', aggregate(sequence(1, $PQ_SUBDIM), 0L, (acc, i) ->
         |          acc + (element_at(vp, mi*$PQ_SUBDIM + i) - element_at(element_at(element_at($cb, mi+1), ci+1), i))
         |              * (element_at(vp, mi*$PQ_SUBDIM + i) - element_at(element_at(element_at($cb, mi+1), ci+1), i))),
         |        'c', cast(ci as bigint)))).c)""".stripMargin.replace("\n", " ")
    s"element_at(transform(array($ppmExpr), vp0 -> ${pqDimGuardS(body)}), 1)"
  }

  /** Per-QUERY ADC lookup table: lut[m+1][c+1] = dot_ppm(query subvector m,
    * codebook entry c) — the asymmetric-distance trick: the query is never
    * quantized; scoring a corpus vector is [[PQ_M]] table lookups instead
    * of a 64-component dot product. Built scan-side per query row
    * ([[PQ_M]]×[[PQ_KSUB]] = 128 short folds — query sets are small and
    * broadcast).
    */
  def pqLutS(vec: String, cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks): String = {
    val cb = pqCbLitS(cbs)
    val body =
      s"""transform(sequence(0, ${PQ_M - 1}), mi ->
         |    transform(sequence(0, ${PQ_KSUB - 1}), ci ->
         |      aggregate(sequence(1, $PQ_SUBDIM), 0L, (acc, i) ->
         |        acc + element_at(vp, mi*$PQ_SUBDIM + i) * element_at(element_at(element_at($cb, mi+1), ci+1), i))))"""
        .stripMargin.replace("\n", " ")
    s"element_at(transform(array(${pqPpmS(vec)}), vp0 -> ${pqDimGuardS(body)}), 1)"
  }

  /** ADC score of one (query LUT, corpus codes) pair: estimated inner
    * product of the query with the corpus vector's RECONSTRUCTION —
    * [[PQ_M]] lookups, no per-dimension arithmetic.
    */
  private[pipeline] def pqScoreS(lut: String, codes: String): String =
    s"""aggregate(sequence(0, ${PQ_M - 1}), 0L, (acc, mi) ->
       |  acc + element_at(element_at($lut, mi+1), cast(element_at($codes, mi+1) as int) + 1))"""
      .stripMargin.replace("\n", " ")

  /** ENCODE a corpus to (id, codes) — the one-time at-rest pass: at 100 TB
    * the float store is written once as PQ codes (64× smaller: 8 codes vs
    * 64 floats) and every probe afterwards reads codes only. Pair with
    * [[graft.pipeline.ShingleStage.stagedTable]] / a bucketed layout to
    * make probes scan co-located fixed-width rows.
    */
  def pqEncode(
      corpus: DataFrame,
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), graft.functions.PqCodes.of(col(vecCol), cbs).as("codes"))

  /** PQ top-k over a PRE-ENCODED (id, codes) corpus — the production probe:
    * queries broadcast with their ADC LUTs; each (query, corpus) pair costs
    * [[PQ_M]] array lookups; per-query top-k via window. The corpus never
    * shuffles and its floats never load.
    */
  def pqKnnOf(
      codes: DataFrame,
      queries: DataFrame,
      k: Int,
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        graft.functions.PqLut.of(col(vecCol), cbs).as("lut")))
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", graft.functions.PqAdc.of(col("lut"), col("codes")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** ANN RECALL REPORT — `recall@k` of an approximate top-k against the
    * exact baseline, the number an operator watches when swapping trained
    * centroids ([[graft.pipeline.KMeans.train]]) or codebooks ([[pqTrain]]) into a 100 TB
    * index: a routing or quantization regression shows up here before it
    * shows up in downstream quality. One row: (method, n_exact, n_hit,
    * recall_ppm), where a hit is an exact-neighbor (query_id, neighbor_id)
    * pair the approximate result also returned (rank-insensitive — the
    * standard recall@k convention) and recall_ppm is the integer ppm
    * share.
    *
    * Scale shape: both inputs are top-k OUTPUTS (|queries| × k rows —
    * model-sized next to the corpus), so the join and the single
    * aggregate are trivial; the cost lives in producing the exact
    * baseline, which is the one deliberately-quadratic operator in the
    * family and is therefore run over a SAMPLED query set, never the full
    * corpus (the ext_knn_* convention: a handful of probe queries).
    * LEFT join from the exact side: an approximate pair absent from the
    * baseline (a false neighbor) must lower recall by not matching, not
    * inflate the denominator.
    */
  def knnRecall(exact: DataFrame, approx: DataFrame, method: String): DataFrame =
    exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1).as("__hit")),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
      // greatest: an EMPTY exact baseline (probe set with no neighbors)
      // reports 0/0 as recall 0, not a NULL that diverges from the
      // oracle's division-by-zero error
      .select(lit(method).as("method"), col("n_exact"), col("n_hit"),
        expr("n_hit * 1000000 DIV greatest(n_exact, 1)").as("recall_ppm"))

  /** PQ top-k with inline encode (correctness/bench form — production uses
    * [[pqEncode]] once + [[pqKnnOf]] per probe batch).
    */
  def pqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    pqKnnOf(pqEncode(corpus, cbs, idCol, vecCol), queries, k, cbs, idCol, vecCol)

  /** TRAIN PQ codebooks — per-subspace Lloyd k-means over the ppm-integer
    * subvectors, all [[PQ_M]] subspaces in the SAME scan (the
    * [[KMeans.train]] discipline, specialized):
    *
    *  - init: the [[PQ_KSUB]] corpus vectors with the smallest
    *    `xxhash64(id)` seed every subspace's codebook from their
    *    subvectors (TakeOrdered — deterministic, no rand(), retry-stable);
    *  - each round: ONE pass computes every row's per-subspace assignment
    *    (the same scan-side [[pqCodesS]] argmin the encode path uses) and
    *    reduces per (subspace, code, component) SUM/COUNT — integer sums,
    *    so cross-partition reassociation cannot perturb them and identical
    *    inputs train identical codebooks with no rounding epsilon at all
    *    (stronger than the float-mean 1e-6 rounding [[KMeans.train]]
    *    needs);
    *  - only model-sized data reaches the driver: M×KSUB×SUBDIM = 1024
    *    aggregate rows per round;
    *  - empty codes keep their previous entry (no resampling).
    *
    * Unlike IVF (where untrained pseudo-random centroids only ROUTE and
    * the scoring stays exact), PQ codebooks RECONSTRUCT the data — an
    * untrained codebook quantizes to noise and recall collapses, so
    * production PQ always trains. Returns a table for the `cbs` parameter
    * of [[pqEncode]]/[[pqKnnOf]]/[[pqKnn]].
    */
  def pqTrain(
      corpus: DataFrame,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Long]]] = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val vecs = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), expr(pqPpmS(vecCol)).as("__p"))
    pqTrainOnPpm(vecs, iters)
  }

  /** The Lloyd loop over an explicit (__id, __p ppm-array) frame — shared
    * by [[pqTrain]] (raw vectors) and [[pqTrainResidual]] (cell
    * residuals).
    */
  private def pqTrainOnPpm(vecs: DataFrame, iters: Int): Seq[Seq[Seq[Long]]] = {
    val seeds = vecs
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(PQ_KSUB)
      .select("__p").collect().map(_.getSeq[Long](0).toIndexedSeq)
    require(seeds.size == PQ_KSUB,
      s"corpus has only ${seeds.size} non-null vectors for $PQ_KSUB codebook entries")
    require(seeds.head.size == PQ_M * PQ_SUBDIM,
      s"pqTrain expects ${PQ_M * PQ_SUBDIM}-dim vectors, got ${seeds.head.size}")
    val init: Seq[Seq[Seq[Long]]] = (0 until PQ_M).map(m =>
      (0 until PQ_KSUB).map(c =>
        (0 until PQ_SUBDIM).map(i => seeds(c)(m * PQ_SUBDIM + i))))
    (0 until iters).foldLeft(init) { (cbs, _) =>
      val sums = vecs
        .withColumn("__codes", graft.functions.PqCodes.of(col("__p"), cbs))
        .select(col("__codes"), posexplode(col("__p")).as(Seq("__pos", "__comp")))
        .withColumn("__m", expr(s"__pos DIV $PQ_SUBDIM"))
        .withColumn("__c", expr("element_at(__codes, cast(__m as int) + 1)"))
        .groupBy(col("__m"), col("__c"), expr(s"cast(__pos % $PQ_SUBDIM as bigint)").as("__i"))
        .agg(sum(col("__comp")).as("__sum"), count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      (0 until PQ_M).map(m => (0 until PQ_KSUB).map(c => (0 until PQ_SUBDIM).map { i =>
        sums.get((m.toLong, c.toLong, i.toLong)) match {
          // integer sum / count — rint of an exact ratio, fully deterministic
          case Some((s, n)) => math.rint(s.toDouble / n).toLong
          case None => cbs(m)(c)(i)
        }
      }))
    }
  }

  // ------------------------------------------------------------ IVF-PQ
  // residual encoding (the standard FAISS IVFPQ composition): quantize
  // vec − centroid(cell) instead of the raw vector. Residuals concentrate
  // near the origin — the coarse quantizer has already explained the
  // cell-level structure — so the same codebook budget (M×KSUB entries)
  // spends its resolution on a much smaller ball and reconstruction error
  // drops; with trained cells AND trained residual codebooks this is the
  // configuration production IVFPQ ships. Scoring stays ADC:
  //   dot(q, centroid_c + recon(codes)) = dot(q, centroid_c) + LUT(codes)
  // — one integer base term per (query, probed cell) plus the same M
  // table lookups as flat PQ. All-integer ppm arithmetic end to end.

  /** Centroid table in ppm (floor(x·1e6)) as a SQL literal — the integer
    * twin of the double centroid literal, so residuals subtract exactly
    * the same values in both engines.
    */
  /** Centroid components in ppm (floor(x*1e6) — the pqPpmS floor), the
    * table the native residual/norm kernels embed.
    */
  private[pipeline] def centroidsPpm(centroids: Seq[Seq[Double]]): Seq[Seq[Long]] =
    centroids.map(_.map(x => math.floor(x * 1000000).toLong))

  private def centPpmLitS(centroids: Seq[Seq[Double]]): String =
    centroids.map(_.map(x => math.floor(x * 1000000).toLong)
        .mkString("array(", "L,", "L)"))
      .mkString("array(", ",", ")")

  /** Residual ppm array for a row carrying `cell`: ppm(vec) − ppm(centroid
    * of its cell), dimension-guarded on the input vector.
    */
  private[pipeline] def residualPpmS(vecCol: String, centroids: Seq[Seq[Double]]): String = {
    val cp = centPpmLitS(centroids)
    val body =
      s"""transform(sequence(1, ${PQ_M * PQ_SUBDIM}), ri ->
         |  element_at(vp, ri) - element_at(element_at($cp, cast(cell as int) + 1), ri))"""
        .stripMargin.replace("\n", " ")
    s"element_at(transform(array(${pqPpmS(vecCol)}), vp0 -> ${pqDimGuardS(body)}), 1)"
  }

  /** Squared norm (ppm²) of the RECONSTRUCTION centroid(cell) +
    * codebook(codes) — the per-vector constant L2 ADC needs: estimated
    * −‖q − recon‖² = 2·dot(q, recon) − ‖recon‖² (+ ‖q‖², constant per
    * query). Stored once at encode time; pure Long arithmetic.
    */
  private[pipeline] def reconNrm2S(centroids: Seq[Seq[Double]], cbs: Seq[Seq[Seq[Long]]]): String = {
    val cp = centPpmLitS(centroids)
    val cb = pqCbLitS(cbs)
    s"""element_at(transform(array(codes), cs ->
       |  aggregate(sequence(1, ${PQ_M * PQ_SUBDIM}), 0L, (acc, i) ->
       |    acc + (element_at(element_at($cp, cast(cell as int) + 1), i)
       |           + element_at(element_at(element_at($cb, cast((i-1) DIV $PQ_SUBDIM as int) + 1),
       |               cast(element_at(cs, cast((i-1) DIV $PQ_SUBDIM as int) + 1) as int) + 1),
       |               cast((i-1) % $PQ_SUBDIM as int) + 1))
       |        * (element_at(element_at($cp, cast(cell as int) + 1), i)
       |           + element_at(element_at(element_at($cb, cast((i-1) DIV $PQ_SUBDIM as int) + 1),
       |               cast(element_at(cs, cast((i-1) DIV $PQ_SUBDIM as int) + 1) as int) + 1),
       |               cast((i-1) % $PQ_SUBDIM as int) + 1)))), 1)"""
      .stripMargin.replace("\n", " ")
  }

  /** ENCODE a corpus to (id, cell, codes, nrm2) with RESIDUAL codes — the
    * at-rest IVFPQ layout: same 64× compression as [[pqEncode]] (plus one
    * bigint norm) and the cell column the probe's equi-join routes on.
    * One scan: cell assignment (nCells codegen'd dot folds), residual
    * subtraction, argmin encode, and the reconstruction norm are all
    * scan-side; no shuffle.
    */
  def ivfPqEncode(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), ivfCellOf(col(vecCol), centroids).as("cell"), col(vecCol))
      .select(col(idCol), col("cell"),
        graft.functions.PqResidualCodes.of(
          col(vecCol), col("cell"), centroidsPpm(centroids), cbs).as("codes"))
      .withColumn("nrm2", graft.functions.PqReconNrm2.of(
        col("cell"), col("codes"), centroidsPpm(centroids), cbs))

  /** IVFPQ top-k over a PRE-ENCODED (id, cell, codes, nrm2) corpus:
    * queries broadcast with their ADC LUT, their nprobe probe cells, and
    * one integer base term per cell (dot of the query with each centroid
    * — nCells folds per query, query sets are small); the probe is an
    * equi-join on the cell id, so only the probed cells' codes are
    * scored — the IVF routing win and the PQ memory win compose. The
    * corpus never shuffles and its floats never load.
    *
    * Scoring is L2 ADC (the FAISS IVFPQ default): score = 2·dot(q, recon)
    * − ‖recon‖², i.e. −‖q − recon‖² up to the per-query constant ‖q‖² —
    * dot(q, recon) decomposes as base(query, cell) + LUT(codes). Raw-IP
    * ranking amplifies reconstruction-norm noise (a code word with a
    * large norm scores high against every query); the stored norm term
    * cancels exactly that, and it is what measured better against the
    * cosine ground truth here. All-integer ppm² arithmetic.
    */
  def ivfPqKnnOf(
      encoded: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]],
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cp = centPpmLitS(centroids)
    val basesBody =
      s"""transform(sequence(1, ${centroids.size}), ci ->
         |  aggregate(sequence(1, ${PQ_M * PQ_SUBDIM}), 0L, (acc, i) ->
         |    acc + element_at(vp, i) * element_at(element_at($cp, ci), i)))"""
        .stripMargin.replace("\n", " ")
    val q = broadcast(
      queries.where(col(vecCol).isNotNull)
        .select(col(idCol).as("query_id"),
          graft.functions.PqLut.of(col(vecCol), cbs).as("lut"),
          expr(s"element_at(transform(array(${pqPpmS(vecCol)}), vp0 -> ${pqDimGuardS(basesBody)}), 1)")
            .as("__bases"),
          ivfProbesOf(col(vecCol), centroids, nprobe).as("__probes"))
        .select(col("query_id"), col("lut"), col("__bases"),
          explode(col("__probes")).as("cell"))
        .select(col("query_id"), col("lut"), col("cell"),
          expr("element_at(__bases, cast(cell as int) + 1)").as("__base")))
    val scored = encoded
      .select(col(idCol).as("neighbor_id"), col("cell"), col("codes"), col("nrm2"))
      .join(q, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        lit(2L) * (graft.functions.PqAdc.of(col("lut"), col("codes")) + col("__base"))
          - col("nrm2"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** IVFPQ top-k with inline encode (correctness/bench form — production
    * uses [[ivfPqEncode]] once + [[ivfPqKnnOf]] per probe batch).
    */
  def ivfPqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]],
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfPqKnnOf(ivfPqEncode(corpus, centroids, cbs, idCol, vecCol),
      queries, k, centroids, cbs, nprobe, idCol, vecCol)

  /** TRAIN residual codebooks — [[pqTrain]]'s Lloyd loop over the CELL
    * RESIDUALS instead of the raw vectors (the FAISS IVFPQ training
    * order: train the coarse quantizer first, then fit codebooks to what
    * it leaves unexplained). Deterministic like [[pqTrain]] (hash-seeded
    * init, exact integer sums).
    */
  def pqTrainResidual(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Long]]] = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val vecs = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        ivfCellOf(col(vecCol), centroids).as("cell"), col(vecCol))
      .select(col("__id"), expr(residualPpmS(vecCol, centroids)).as("__p"))
    pqTrainOnPpm(vecs, iters)
  }

  /** CLUSTER CENTROID SUMMARIES — the retrain feed: after a dedup election
    * ([[semanticDedup]] / [[semanticDedupIncremental]] / the minhash
    * family), each cluster's mean embedding is its representative — the
    * vector that seeds the NEXT round's IVF cells or SemDeDup centroids
    * (the standing remedy for a giant cell is "retrain on current data";
    * this is the aggregation that retraining reads). Emitted EXPLODED as
    * (cluster_id, pos, mean_ppm): integer ppm means via exact integer
    * sums and one floor division — deterministic and oracle-hashable,
    * and the consumer (a centroid table literal) wants per-component
    * rows anyway.
    *
    * Scale: the join is id-equi; the aggregate is map-side-combinable
    * sum/count per (cluster, component) — nCluster × dim rows out, never
    * a collect_list of member vectors.
    */
  def clusterCentroids(
      labeled: DataFrame,
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(labeled.columns.contains("cluster_id"),
      s"labeled must carry 'cluster_id', got ${labeled.columns.mkString(", ")}")
    labeled.select(col(idCol), col("cluster_id"))
      .join(emb.where(col(vecCol).isNotNull).select(col(idCol), col(vecCol)), idCol)
      .select(col("cluster_id"),
        posexplode(expr(pqPpmS(vecCol))).as(Seq("__p0", "__v")))
      .groupBy(col("cluster_id"), expr("cast(__p0 as bigint)").as("pos"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .select(col("cluster_id"), col("pos"),
        expr("cast(floor(cast(__s as double) / __n) as bigint)").as("mean_ppm"))
  }

  // ------------------------------------------------------- IVF+PQ incremental

  /** Per-(subspace, code) self-dot of the codebook entry — ||cb[m][c]||²
    * in ppm². Because subspaces are disjoint coordinate blocks, the squared
    * norm of a PQ RECONSTRUCTION is exactly the sum of its entries' self
    * dots: ||recon||² = Σ_m ||cb[m][code_m]||², no cross terms. Emitted as
    * a literal lookup table next to the ADC LUT, so the probe recovers a
    * true cosine estimate from integer ingredients only.
    */
  def pqSelfDots(cbs: Seq[Seq[Seq[Long]]]): Seq[Seq[Long]] =
    cbs.map(_.map(entry => entry.map(v => v * v).sum))

  private def pqSelfDotLitS(cbs: Seq[Seq[Seq[Long]]]): String =
    pqSelfDots(cbs).map(row => row.mkString("array(", "L,", "L)"))
      .mkString("array(", ",", ")")

  /** Squared norm of the ppm quantization of the vector (exact integer). */
  def pqQNorm2S(vec: String): String =
    s"aggregate(${pqPpmS(vec)}, 0L, (acc, x1) -> acc + x1 * x1)"

  /** Estimated-cosine ppm of (query LUT, corpus codes): ADC inner product
    * over the reconstruction, normalized by the exact integer norms —
    * floor((adc / (sqrt(q2) * sqrt(max(r2, 1)))) * 1e6). Every ingredient
    * is an exact integer ≤ ~2^46, so the doubles, the IEEE-correctly-
    * rounded sqrts, and the floor are bit-identical across engines (the
    * mixture-temperature sqrt precedent).
    */
  /** COLUMN form of [[pqCosPpmS]] over the native [[graft.functions.PqAdc]]
    * kernel — the per-pair hot path of [[ivfPqStoreMatches]]: both
    * integer folds (the ADC dot terms and the reconstruction norm, M
    * lookups each) run as one static kernel call instead of two
    * interpreted HOF aggregates; the surrounding float arithmetic is the
    * same IEEE sequence, so outputs are bit-identical (spec-asserted
    * differentially against the HOF spelling below).
    */
  def pqCosPpm(lut: Column, codes: Column, q2: Column, cbs: Seq[Seq[Seq[Long]]]): Column = {
    val adc = graft.functions.PqAdc.of(lut, codes)
    val r2 = graft.functions.PqAdc.of(expr(pqSelfDotLitS(cbs)), codes)
    floor((adc.cast("double") /
        (sqrt(q2.cast("double")) * sqrt(greatest(r2, lit(1L)).cast("double"))))
      * lit(1000000)).cast("long")
  }

  /** The HOF spelling of the ADC cosine (the differential REFERENCE for
    * [[pqCosPpm]]; hot paths use the Column form).
    */
  def pqCosPpmS(lut: String, codes: String, q2: String, cbs: Seq[Seq[Seq[Long]]]): String = {
    val sd = pqSelfDotLitS(cbs)
    val adc = pqScoreS(lut, codes)
    val r2 = s"""aggregate(sequence(0, ${PQ_M - 1}), 0L, (acc2, mj) ->
       |  acc2 + element_at(element_at($sd, mj+1), cast(element_at($codes, mj+1) as int) + 1))"""
      .stripMargin.replace("\n", " ")
    s"cast(floor((cast($adc as double) / (sqrt(cast($q2 as double)) * sqrt(cast(greatest($r2, 1L) as double)))) * 1000000) as bigint)"
  }

  /** ENCODE a corpus into the persistent VECTOR STORE row shape — (id,
    * cell, codes): the IVF cell routes probes (computed from the floats
    * while they exist, i.e. at write time), the PQ codes are all a probe
    * ever scores against. The caller attaches `cluster_id` (own id for a
    * deduped store) — the same contract as the minhash signature store.
    * 64-dim floats never persist: the store row is fixed-width and ~64×
    * smaller, which at 100 TB is the difference between an in-memory
    * probe side and a second corpus.
    */
  def vecStoreEncode(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol),
        ivfCellOf(col(vecCol), centroids).as("cell"),
        graft.functions.PqCodes.of(col(vecCol), cbs).as("codes"))

  /** Probe a NEW batch against the PQ-encoded vector store — the IVFPQ
    * probe: each batch vector computes its `nprobe` nearest cells, its ADC
    * LUT, and its exact integer norm scan-side; the join is cell-equi
    * (the store shuffles — or at rest: is bucketed — by cell, never
    * broadcast or paired all-to-all); each surviving pair costs [[PQ_M]]
    * lookups. Returns (idCol, store_id, cluster_id, cos_ppm) for pairs
    * whose estimated cosine clears `tauPpm`.
    */
  def ivfPqStoreMatches(
      batch: DataFrame,
      vecStore: DataFrame,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      nprobe: Int = 2,
      tauPpm: Long = 850000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(Seq("cell", "codes", "cluster_id").forall(vecStore.columns.contains),
      s"vecStore must carry 'cell', 'codes', 'cluster_id', got ${vecStore.columns.mkString(", ")}")
    val qb = batch.where(col(vecCol).isNotNull)
      .select(col(idCol),
        explode(ivfProbesOf(col(vecCol), centroids, nprobe)).as("cell"),
        graft.functions.PqLut.of(col(vecCol), cbs).as("__lut"),
        expr(pqQNorm2S(vecCol)).as("__q2"))
    qb.join(vecStore.select(col(idCol).as("store_id"), col("cell"), col("codes"), col("cluster_id")), "cell")
      .withColumn("cos_ppm", pqCosPpm(col("__lut"), col("codes"), col("__q2"), cbs))
      .where(col("cos_ppm") >= tauPpm)
      .select(col(idCol), col("store_id"), col("cluster_id"), col("cos_ppm"))
  }

  /** INCREMENTAL SEMANTIC dedup — the embedding-granularity member of the
    * incremental dedup family ([[graft.pipeline.Dedup.exactDedupIncremental]]
    * exact, [[graft.pipeline.Dedup.minhashDedupIncremental]] near-dup):
    * a growing corpus must not re-pay full-corpus semantic dedup per
    * ingest round, so new batches probe the PQ-encoded store
    * ([[ivfPqStoreMatches]] — historical floats never load, only codes),
    * pair among themselves (cell-blocked exact cosine, the [[semanticDedup]]
    * plan), and the union graph collapses through connected components.
    * Same output contract as the minhash twin: (idCol, cluster_id,
    * is_novel), store-min election, bridge documents merge old clusters.
    *
    * Thresholds are deliberately split: batch↔batch pairs use EXACT cosine
    * (floats are in hand — one scan), batch↔store uses the ADC estimate
    * (floats are gone — quantization error is the price of the 64× store).
    * The ID-DISJOINTNESS contract of the minhash twin applies unchanged.
    */
  def semanticDedupIncremental(
      batch: DataFrame,
      vecStore: DataFrame,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      tauPpm: Long = 850000L,
      nprobe: Int = 2,
      maxCellRows: Long = 1000000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      checkIdDisjointness: Boolean = false): DataFrame = {
    if (checkIdDisjointness) {
      // the minhash twin's opt-in debug guard, same contract: batch ids and
      // store cluster ids are nodes of ONE component graph
      val clashes = batch.select(col(idCol).as("cluster_id"))
        .join(vecStore.select("cluster_id").distinct(), Seq("cluster_id"), "left_semi")
      val sample = clashes.limit(3).collect().map(_.get(0))
      require(sample.isEmpty,
        s"semanticDedupIncremental: batch ids collide with store cluster ids " +
          s"(e.g. ${sample.mkString(", ")}) — the component graph would conflate " +
          "them into one cluster; remap one id space first")
    }
    val b0 = batch.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__cell", ivfCellOf(col("__v"), centroids))
      .withColumn("__nrm", norm(col("__v")))
    val b = if (maxCellRows > 0) {
      b0.withColumn("__csz", count(lit(1)).over(Window.partitionBy("__cell")))
        .withColumn("__cell", when(col("__csz") <= maxCellRows, col("__cell"))
          .otherwise(expr(
            s"""cast(raise_error(concat('semanticDedupIncremental: batch cell ', cast(__cell as string),
               | ' holds ', cast(__csz as string), ' rows (> ${maxCellRows}) - retrain centroids',
               | ' or raise maxCellRows')) as bigint)""".stripMargin)))
        .drop("__csz")
    } else b0
    // persist: the self-join evaluates BOTH sides (cell assignment, norm,
    // and the cell-size guard window re-run per side without it) — the
    // minhash twin's bsig discipline
    b.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact-cosine ppm (floor) so the threshold semantics match the store
    // probe's integer compare — for integer tauPpm, floor(c*1e6) >= tau
    // iff c*1e6 >= tau
    val pairs = b.as("x").join(b.as("y"),
        col("x.__cell") === col("y.__cell") && col("x.__id") < col("y.__id"))
      .withColumn("__cos_ppm",
        floor(dot(col("x.__v"), col("y.__v")) / (col("x.__nrm") * col("y.__nrm")) * 1e6).cast("long"))
      .where(col("__cos_ppm") >= tauPpm)
      .select(col("x.__id").as("id1"), col("y.__id").as("id2"))
    val matches = ivfPqStoreMatches(batch, vecStore, centroids, cbs, nprobe, tauPpm, idCol, vecCol)
    val edges = pairs.unionByName(
      matches.select(col(idCol).as("id1"), col("cluster_id").as("id2")).distinct())
    val comps = Dedup.connectedComponentsAuto(edges)
    val storeClusters = vecStore.select("cluster_id").distinct()
    val storeMin = comps.join(storeClusters, comps("id") === storeClusters("cluster_id"))
      .groupBy("comp").agg(min(col("cluster_id")).as("__store_min"))
    batch.where(col(vecCol).isNotNull).select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .join(storeMin, Seq("comp"), "left")
      .select(col(idCol),
        coalesce(col("__store_min"), col("comp"), col(idCol)).as("cluster_id"),
        col("__store_min").isNull.as("is_novel"))
  }

  /** The APPEND step closing the incremental semantic loop: new store rows
    * for a just-labeled batch — (id, cell, codes, cluster_id). The same
    * contract as [[graft.pipeline.Dedup.sigStoreAppend]]: union onto the
    * store for the next round; merged-away cluster ids still route probes
    * into the merged component via the store-min election.
    */
  def vecStoreAppend(
      batch: DataFrame,
      assignments: DataFrame,
      centroids: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Long]]] = defaultPqCodebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(assignments.columns.contains("cluster_id"),
      s"assignments must carry 'cluster_id' (a semanticDedupIncremental result), " +
        s"got ${assignments.columns.mkString(", ")}")
    vecStoreEncode(batch, centroids, cbs, idCol, vecCol)
      .join(assignments.select(col(idCol), col("cluster_id")), idCol)
      .select(col(idCol), col("cell"), col("codes"), col("cluster_id"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus into
    * centroid cells, find within-cell pairs with cosine >= `minCos`, and
    * collapse the pair graph into clusters with one elected keeper each
    * (min-id, via [[Dedup.connectedComponentsAuto]] — near-dup similarity
    * is not transitive, so (A,B)+(B,C) must merge before dropping
    * anything; the auto dispatcher keeps min-label as the fast path and
    * falls back to star contraction if a component's diameter exceeds the
    * near-dup assumption, so adversarial chains converge in O(log n)
    * rounds without user code).
    *
    * The cell assignment is the blocking step (the published SemDeDup
    * recipe: k-means the embeddings, then compare ONLY within a cluster):
    * pairs never form across cells, so a near-dup pair straddling a cell
    * boundary is missed by design — the standard recall/cost trade, tuned
    * by `centroids` (fewer cells = higher recall, more pairs). Use
    * [[KMeans.train]] output for trained cells or
    * [[defaultCentroids]] for the deterministic untrained form.
    *
    * Scale shape: assignment is scan-side (literal centroids, codegen'd
    * dot folds); the pair join is an equi-join on the cell id, so the
    * corpus shuffles by cell and each cell's pairs form locally —
    * quadratic ONLY within a cell (cells are corpus/nCells sized). A
    * pathological giant cell means the centroids need retraining, the
    * same remedy as a hot LSH bucket — and that must FAIL FAST, not burn
    * a quadratic join first: the in-plan guard raises past `maxCellRows`
    * rows in one cell (a count window sharing the pair join's cell
    * partitioning — no extra exchange) before any pair forms. The
    * component step runs on the pair graph only, never the corpus.
    *
    * Returns (idCol, cluster_id, is_keeper) for every non-null-vector row.
    */
  def semanticDedup(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      minCos: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCellRows: Long = 1000000L): DataFrame = {
    require(centroids.nonEmpty && centroids.map(_.size).distinct.size == 1,
      "centroids must be a non-empty table of equal-dimension vectors")
    require(minCos > 0.0 && minCos <= 1.0,
      s"minCos must be in (0, 1], got $minCos (a non-positive threshold pairs everything in a cell)")
    val b0 = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__cell", ivfCellOf(col("__v"), centroids))
      .withColumn("__nrm", norm(col("__v")))
    // giant-cell guard rides on the join key so it cannot be pruned away
    val b = if (maxCellRows > 0) {
      b0.withColumn("__csz", count(lit(1)).over(Window.partitionBy("__cell")))
        .withColumn("__cell", when(col("__csz") <= maxCellRows, col("__cell"))
          .otherwise(expr(
            s"""cast(raise_error(concat('semanticDedup: cell ', cast(__cell as string),
               | ' holds ', cast(__csz as string), ' rows (> ${maxCellRows}) - the within-cell',
               | ' pair join would be quadratic; retrain centroids (KMeans.train, more cells)',
               | ' or raise maxCellRows')) as bigint)""".stripMargin)))
        .drop("__csz")
    } else b0
    val pairs = b.as("x").join(b.as("y"),
        col("x.__cell") === col("y.__cell") && col("x.__id") < col("y.__id"))
      .where(dot(col("x.__v"), col("y.__v")) / (col("x.__nrm") * col("y.__nrm")) >= minCos)
      .select(col("x.__id").as("id1"), col("y.__id").as("id2"))
    val comps = Dedup.connectedComponentsAuto(pairs)
    corpus.where(col(vecCol).isNotNull).select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("cluster_id"),
        (coalesce(col("comp"), col(idCol)) === col(idCol)).as("is_keeper"))
  }
}
