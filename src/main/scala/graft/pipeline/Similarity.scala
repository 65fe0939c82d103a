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
  def pqCodesFromPpmS(ppmExpr: String, cbs: Seq[Seq[Seq[Long]]]): String = {
    val cb = pqCbLitS(cbs)
    s"""element_at(transform(array($ppmExpr), vp ->
       |  transform(sequence(0, ${PQ_M - 1}), mi ->
       |    array_min(transform(sequence(0, ${PQ_KSUB - 1}), ci ->
       |      named_struct(
       |        'd', aggregate(sequence(1, $PQ_SUBDIM), 0L, (acc, i) ->
       |          acc + (element_at(vp, mi*$PQ_SUBDIM + i) - element_at(element_at(element_at($cb, mi+1), ci+1), i))
       |              * (element_at(vp, mi*$PQ_SUBDIM + i) - element_at(element_at(element_at($cb, mi+1), ci+1), i))),
       |        'c', cast(ci as bigint)))).c)), 1)""".stripMargin.replace("\n", " ")
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
    s"""element_at(transform(array(${pqPpmS(vec)}), vp ->
       |  transform(sequence(0, ${PQ_M - 1}), mi ->
       |    transform(sequence(0, ${PQ_KSUB - 1}), ci ->
       |      aggregate(sequence(1, $PQ_SUBDIM), 0L, (acc, i) ->
       |        acc + element_at(vp, mi*$PQ_SUBDIM + i) * element_at(element_at(element_at($cb, mi+1), ci+1), i))))), 1)""".stripMargin.replace("\n", " ")
  }

  /** ADC score of one (query LUT, corpus codes) pair: estimated inner
    * product of the query with the corpus vector's RECONSTRUCTION —
    * [[PQ_M]] lookups, no per-dimension arithmetic.
    */
  private def pqScoreS(lut: String, codes: String): String =
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
      .select(col(idCol), expr(pqCodesS(vecCol, cbs)).as("codes"))

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
      .select(col(idCol).as("query_id"), expr(pqLutS(vecCol, cbs)).as("lut")))
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", expr(pqScoreS("lut", "codes")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

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
        .withColumn("__codes", expr(pqCodesFromPpmS("__p", cbs)))
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
