package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The four pipeline stages compose end to end the way a pretraining data
  * pipeline runs them — quality filter → exact dedup → stratified sample →
  * sequence packing — over the real documents table, with row accounting
  * at every stage and full determinism across re-runs.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("filter → dedup → sample → pack composes with exact row accounting") {
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir not present")
    val docs = Tables.documents(spark, dir)
    val total = docs.count()

    // 1. quality filter (keep only clean docs, with a reasons breakdown)
    val filtered = docs.join(
      TextAnalysis.gopherFilter(docs).where(col("keep") === 1L).select("doc_id"), "doc_id")
    val nFiltered = filtered.count()
    assert(nFiltered > 0 && nFiltered <= total)

    // 2. exact dedup keeps one doc per distinct text
    val deduped = filtered.join(
      Dedup.exactDedup(filtered).where(col("is_keeper")).select("doc_id"), "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped <= nFiltered)
    assert(deduped.select("text").distinct().count() == nDeduped,
      "post-dedup texts must be unique")

    // 3. stratified sample to language rates
    val sampled = Sampling.stratifiedByRate(
      deduped.select("doc_id", "lang", "text"), "lang",
      Seq(("en", 700000L), ("zh", 700000L)).toDF("lang", "rate_ppm"),
      defaultPpm = 500000L)
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= nDeduped)

    // 4. pack the survivors into 256-token contexts
    val packed = Packing.packChunks(
      sampled.select(col("doc_id"),
        expr(s"size(${TextOps.toksS("text")})").cast("long").as("n_tokens")),
      ctxTokens = 256L, nShards = 4)
    assert(packed.count() == nSampled, "packing must assign every sampled doc")
    assert(packed.select("doc_id").distinct().count() == nSampled)

    // deterministic end to end: the same pipeline re-run picks the same
    // docs and the same layout
    val again = Packing.packChunks(
      Sampling.stratifiedByRate(
          filtered.join(
              Dedup.exactDedup(filtered).where(col("is_keeper")).select("doc_id"), "doc_id")
            .select("doc_id", "lang", "text"), "lang",
          Seq(("en", 700000L), ("zh", 700000L)).toDF("lang", "rate_ppm"),
          defaultPpm = 500000L)
        .select(col("doc_id"),
          expr(s"size(${TextOps.toksS("text")})").cast("long").as("n_tokens")),
      ctxTokens = 256L, nShards = 4)
    assert(packed.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }

  test("ingest round composes: excise → classifier → store probe → exact-count sample → pack") {
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir not present")
    val docs = Tables.documents(spark, dir)

    // 1. exact-substring cleanup: excise corpus-duplicated spans
    val cleaned = Dedup.exciseSpans(docs, Dedup.duplicateSpans(docs, w = 10))
      .join(docs.select("doc_id", "source"), "doc_id")
    assert(cleaned.count() == docs.count(), "excision rewrites, never drops")

    // 2. model-based quality filter on the CLEANED text
    val kept = cleaned.join(
      TextAnalysis.classifierScoreInline(cleaned,
          Map("data" -> 400L, "join" -> 250L, "slow" -> -400L, "the" -> -100L),
          biasMilli = 20L, textCol = "clean_text")
        .where(col("keep")).select("doc_id"),
      "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < docs.count())

    // 3. incremental dedup: probe against a prior-snapshot store
    val store = docs.where(col("doc_id") % 3 === 0)
      .select(md5(col("text")).as("h"))
    val fresh = kept.join(
      Dedup.exactDedupIncremental(kept, store, textCol = "clean_text").select("doc_id"),
      "doc_id")
    val nFresh = fresh.count()
    assert(nFresh > 0 && nFresh <= nKept)

    // 4. exact-count mixture over the fresh survivors
    val caps = fresh.select("source").distinct().collect().map(_.getString(0))
      .sorted.take(3).map(_ -> 5L).toMap
    val sampled = Sampling.exactPerStratum(
      fresh.select("doc_id", "source", "clean_text"), "source", caps)
    val bySrc = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(caps.keySet), "unlisted strata must drop")
    assert(bySrc.forall { case (s, n) => n <= caps(s) }, "caps are exact upper bounds")

    // 5. pack the sample into 128-token contexts
    val packed = Packing.packChunks(
      sampled.select(col("doc_id"),
        expr(s"size(${TextOps.toksS("clean_text")})").cast("long").as("n_tokens")),
      ctxTokens = 128L, nShards = 2)
    assert(packed.count() == sampled.count(), "packing must assign every sampled doc")
  }

  test("trained-centroid SemDeDup: KMeans.train composes into semanticDedup, deterministic, recall >= defaultCentroids") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir not present")
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // exact vector copies so true near-dup clusters exist
    val aug = emb.unionByName(emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))

    // training is deterministic end to end: identical inputs -> identical
    // centroids (hash-seeded init + 1e-6-rounded means), so cluster ids
    // are stable across re-runs
    val trained = KMeans.train(emb, nCells = 8, iters = 2)
    val trained2 = KMeans.train(emb, nCells = 8, iters = 2)
    assert(trained == trained2, "KMeans.train must be run-to-run deterministic")

    val withTrained = Similarity.semanticDedup(aug, trained, 0.999)
    val withDefault = Similarity.semanticDedup(aug, Similarity.defaultCentroids(64, 8), 0.999)

    // determinism of the composed pipeline: same input, same labels
    assert(withTrained.collect().map(_.toSeq).toSet ==
      Similarity.semanticDedup(aug, KMeans.train(emb, nCells = 8, iters = 2), 0.999)
        .collect().map(_.toSeq).toSet)

    // exact copies land in the SAME Lloyd cell by construction (identical
    // vectors score identically), so trained-centroid recall on the
    // injected duplicates is total — and at least what the fixed
    // hash-grid defaultCentroids achieve
    def dupsCaught(df: org.apache.spark.sql.DataFrame): Long =
      df.where(col("vec_id") >= 1000000L && !col("is_keeper")).count()
    val nInjected = aug.where(col("vec_id") >= 1000000L).count()
    assert(dupsCaught(withTrained) == nInjected,
      "every injected exact copy must collapse onto its original")
    assert(dupsCaught(withTrained) >= dupsCaught(withDefault))

    // trained cells are data-adaptive: assignment must use them (the two
    // centroid tables produce different cell populations)
    val cellsT = aug.select(Similarity.ivfCellOf(col("embedding"), trained).as("c"))
      .groupBy("c").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellsT.nonEmpty && cellsT.values.sum == aug.count())
  }

  test("multi-epoch mixture feeds packing via a composite sequence id") {
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir not present")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      expr(s"cast(size(${TextOps.toksS("text")}) as bigint)").as("n_tok"))
    val budgets = Map("src0" -> 5000L, "src1" -> 700L)
    val epochs = Sampling.mixtureByBudgetEpochs(docs, "source", budgets,
      tokensCol = "n_tok", defaultPpm = 0L)
    val nRows = epochs.count()
    assert(nRows > docs.where(col("source") === "src0").count(),
      "src0 must upsample past one epoch")

    // packing keys rows by id — epoch copies need a composite id so each
    // copy gets its own pseudo-shuffled position (and the bucketPpm
    // magnitude guard rides along: doc_id * 1000 stays well inside 2^31)
    val packed = Packing.packChunks(
      epochs.select((col("doc_id") * 1000L + col("epoch")).as("seq_id"),
        col("n_tok").as("n_tokens")),
      ctxTokens = 128L, nShards = 2, idCol = "seq_id")
    assert(packed.count() == nRows, "every epoch copy packs exactly once")
    // copies of the same doc land at distinct layout positions
    val positions = packed
      .select((col("seq_id") / 1000L).cast("long").as("doc_id"), col("shard"), col("start_tok"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSeq
      .groupBy(_._1).values
    assert(positions.forall(g => g.map(_._2).distinct.size == g.size),
      "epoch copies must not collapse onto one position")
  }

  test("mixture round composes: priority dedup → temperature mixture → token cap → interleave") {
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir not present")
    val docs = Tables.documents(spark, dir)
    // re-release every 5th doc from a curated source (higher ids)
    val aug = docs.select("doc_id", "source", "text")
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          org.apache.spark.sql.functions.lit("curated").as("source"), col("text")))

    // 1. priority dedup: curated copies win their groups
    val priorities = Map("curated" -> 1L, "src0" -> 5L, "src1" -> 5L, "src2" -> 5L, "src3" -> 5L)
    val verdict = Dedup.exactDedupByPriority(aug, priorities)
    val deduped = aug.join(verdict.where(col("is_keeper")).select("doc_id"), "doc_id")
    assert(deduped.count() == docs.count(), "one keeper per distinct text")
    // every curated copy beat its original
    assert(deduped.where(col("source") === "curated").count() ==
      docs.filter(col("doc_id") % 5 === 0).count())

    // 2. temperature mixture over the deduped survivors
    val withTok = deduped.select(col("doc_id"), col("source"),
      expr(s"cast(size(${TextOps.toksS("text")}) as bigint)").as("n_tok"))
    val sampled = Sampling.mixtureByTemperature(withTok, "source", budget = 4000L,
      tokensCol = "n_tok")
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled < withTok.count())

    // 3. exact token cap on one stratum of the sample
    val capped = Sampling.tokenCapPerStratum(
      sampled.select("doc_id", "source", "n_tok"), "source",
      Map("curated" -> 300L), tokensCol = "n_tok")
    val capTok = capped.agg(org.apache.spark.sql.functions.sum("n_tok")).collect()(0).getLong(0)
    assert(capTok <= 300L, s"cap overflow: $capTok")

    // 4. interleave what remains of two strata proportionally
    val mixed = sampled.where(col("source").isin("src0", "src1"))
    val laid = Packing.interleaveByWeight(
      mixed.select("doc_id", "source"), "source", Map("src0" -> 2L, "src1" -> 1L), nShards = 2)
    assert(laid.count() == mixed.count(), "interleave must place every listed doc")
    // deterministic re-run of the whole chain
    val again = Packing.interleaveByWeight(
      Sampling.mixtureByTemperature(withTok, "source", budget = 4000L, tokensCol = "n_tok")
        .where(col("source").isin("src0", "src1")).select("doc_id", "source"),
      "source", Map("src0" -> 2L, "src1" -> 1L), nShards = 2)
    assert(laid.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }

  test("decision round composes: data card → calibrated filter → budget mixture → manifest") {
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir not present")
    val docs = Tables.documents(spark, dir)

    // 1. the data card is what budgets are CHOSEN from: derive per-source
    //    token budgets as half of each source's token total
    val card = TextAnalysis.dataCard(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(card.nonEmpty && card.values.forall(_ > 0))
    val budgets = card.map { case (src, tot) => src -> (tot / 2) }

    // 2. calibrated per-source quality filter keeps each source's top 60%
    val scored = TextAnalysis.qualityScore(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
    val kept = Sampling.calibratedKeep(scored, "source", "quality_ppm", keepPpm = 600000L)
      .where(col("kept")).select("doc_id")
    val keptDocs = docs.join(kept, "doc_id")
    assert(keptDocs.count() > 0 && keptDocs.count() < docs.count(),
      "calibration must actually filter")

    // 3. the kept set flows into the budget mixture and then the shard
    //    manifest — the full decision round, deterministic end to end
    import graft.pipeline.TextOps.toksS
    val withTok = keptDocs.select(col("doc_id"), col("source"),
      expr(s"cast(size(${toksS("text")}) as bigint)").as("n_tok"))
    def run() = {
      val sampled = Sampling.mixtureByBudget(withTok, "source", budgets,
        tokensCol = "n_tok", defaultPpm = 0L)
      Packing.shardManifest(
        Packing.epochShuffle(sampled.select("doc_id"), nShards = 4, epoch = 1L)
          .join(withTok.select(col("doc_id"), col("n_tok").as("n_tokens")), "doc_id"))
    }
    val m1 = run().collect().map(_.toSeq).toSet
    assert(m1.nonEmpty)
    assert(m1 == run().collect().map(_.toSeq).toSet,
      "the whole decision round must be re-run identical")
  }
}
