package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing — the concat-and-chunk step between the
  * dedup/sample stages and the trainer: documents are laid end to end in a
  * deterministic pseudo-shuffled order and cut into fixed `ctxTokens`
  * windows. Every mainstream pretraining pipeline runs exactly this shape;
  * the operator assigns each document its token offset and the chunk range
  * it lands in (a doc spanning a boundary continues in the next chunk —
  * the standard no-padding packing).
  *
  * Scale design (100 TB): a single global concatenation order would make
  * the running-sum window one sequential partition. Packing is therefore
  * SHARDED: the same multiplicative hash the sampling operator uses (so
  * the id-magnitude overflow guard rides along) assigns each doc a shard
  * and its pseudo-random position within the shard, and every shard packs
  * independently in parallel — which is also the production layout (one
  * output file set per shard). Chunk ids are shard-local; (shard,
  * chunk_first) is the global chunk key.
  *
  * Deterministic end to end: hash order (no rand()), integer arithmetic
  * only — a re-run or a retried task packs identically, and an engine
  * replaying the same definition (the DuckDB oracle) reproduces the exact
  * offsets.
  */
object Packing {

  /** @param docs      must carry `idCol` and a non-negative integral
    *                  `tokensCol` (compose with `TextAnalysis.tokenStats`
    *                  or count inline)
    * @param ctxTokens the training context length in tokens
    * @param nShards   independent packing streams; size to cluster
    *                  parallelism (each shard's running sum is sequential)
    * @return (idCol, shard, start_tok, chunk_first, chunk_last, n_chunks)
    *         — start_tok is the doc's offset in its shard's token stream;
    *         zero-token docs occupy no tokens and report their boundary
    *         chunk twice
    */
  def packChunks(
      docs: DataFrame,
      ctxTokens: Long,
      nShards: Int,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame =
    packedCore(docs, ctxTokens, nShards, idCol, tokensCol)
      .select(col(idCol), col("shard"), col("start_tok"),
        col("chunk_first"), col("chunk_last"), col("n_chunks"))

  /** The per-CHUNK companion view — the artifact a training loader actually
    * consumes: one row per (shard, chunk_id) with the documents
    * intersecting it and the chunk's fill. Derived from the same layout as
    * [[packChunks]] (one explode of each doc's chunk range — fan-out =
    * n_chunks per doc, ~1 — then a map-side-combinable aggregate on
    * (shard, chunk_id)). Invariant: every chunk except each shard's last
    * holds exactly `ctxTokens` tokens.
    *
    * @return (shard, chunk_id, n_docs, doc_first, doc_last, fill_tokens)
    */
  def chunkSpans(
      docs: DataFrame,
      ctxTokens: Long,
      nShards: Int,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val packed = packedCore(docs, ctxTokens, nShards, idCol, tokensCol)
      .where(col("__n") > 0) // zero-token docs occupy no chunk
    packed
      .select(col(idCol), col("shard"), col("start_tok"), col("__n"),
        explode(expr(s"sequence(chunk_first, chunk_last)")).as("chunk_id"))
      // tokens of this doc landing in this chunk: overlap of
      // [start, start+n) with [chunk*ctx, (chunk+1)*ctx)
      .withColumn("__in", expr(
        s"""least(start_tok + __n, (chunk_id + 1) * ${ctxTokens}L)
           | - greatest(start_tok, chunk_id * ${ctxTokens}L)""".stripMargin))
      .groupBy("shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("doc_first"), max(col(idCol)).as("doc_last"),
        sum(col("__in")).as("fill_tokens"))
  }

  /** DELETION PROPAGATION (right-to-be-forgotten) through the packed
    * layout: given doc ids to purge, emit every (shard, chunk) of the
    * CURRENT layout whose bytes contain purged content — the chunks that
    * must be rewritten NOW for the purge to be real — plus each affected
    * shard's `rebuild_from` chunk: packing order is the deterministic
    * per-shard hash order, so on a compact repack of the survivors every
    * chunk strictly BEFORE the shard's first purged byte is byte-identical
    * (offsets upstream of the purge point cannot move) and everything
    * from `rebuild_from` onward shifts. A rebuild scheduler reads this
    * table directly: rewrite the listed chunks (or tombstone their purged
    * spans), or repack each shard's `[rebuild_from ..]` suffix.
    *
    * This is [[graft.pipeline.Versioning.corpusDiff]]'s natural
    * consequence — feed its `removed` set in as `purged` — and the reason
    * packing keeps provenance columns at all. Zero-token purged docs
    * occupy no bytes and propagate nowhere; purge ids absent from `docs`
    * are a no-op (already gone).
    *
    * Scale shape: the layout pass is [[packChunks]]'s (per-shard window);
    * the purge set is release-sized, so it BROADCASTS onto the layout;
    * the rollup is one (shard, chunk) aggregation over the purged docs'
    * exploded chunk ranges (fan-out ≈ 1) and one per-shard min.
    * Output: (shard, chunk_id, n_purged, purged_tokens, rebuild_from),
    * one row per dirty chunk.
    */
  def purgePropagate(
      docs: DataFrame,
      purged: DataFrame,
      ctxTokens: Long,
      nShards: Int,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(purged.columns.contains(idCol),
      s"purgePropagate: purged must carry '$idCol', got ${purged.columns.mkString(", ")}")
    val hit = packedCore(docs, ctxTokens, nShards, idCol, tokensCol)
      .join(broadcast(purged.select(idCol).distinct()), Seq(idCol))
      .where(col("__n") > 0)
    val perChunk = hit
      .select(col(idCol), col("shard"), col("start_tok"), col("__n"),
        explode(expr("sequence(chunk_first, chunk_last)")).as("chunk_id"))
      .withColumn("__in", expr(
        s"""least(start_tok + __n, (chunk_id + 1) * ${ctxTokens}L)
           | - greatest(start_tok, chunk_id * ${ctxTokens}L)""".stripMargin))
      .groupBy("shard", "chunk_id")
      .agg(count(lit(1)).as("n_purged"), sum(col("__in")).as("purged_tokens"))
    val from = perChunk.groupBy("shard").agg(min(col("chunk_id")).as("rebuild_from"))
    perChunk.join(from, "shard")
      .select(col("shard"), col("chunk_id"), col("n_purged"),
        col("purged_tokens"), col("rebuild_from"))
  }

  private def packedCore(
      docs: DataFrame,
      ctxTokens: Long,
      nShards: Int,
      idCol: String,
      tokensCol: String): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive, got $ctxTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val missing = Seq(idCol, tokensCol).filterNot(docs.columns.contains)
    require(missing.isEmpty, s"columns absent from docs: ${missing.mkString(", ")}")
    // `__hval`/`shard`/`__n` are written BEFORE the token-count expression
    // reads `tokensCol`, so tokensCol may not collide with them (the shard
    // index would silently become the token count); the post-`__n` output
    // names are safe to overwrite when they ARE the token column.
    val writtenBeforeRead = Seq("__hval", "shard", "__n")
    val writtenAfterRead = Seq("start_tok", "chunk_first", "chunk_last", "n_chunks")
    val reserved = writtenBeforeRead.filter(docs.columns.contains) ++
      writtenAfterRead.filter(c => docs.columns.contains(c) && c != tokensCol)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")

    val toks = expr(
      s"""if(`$tokensCol` is null or `$tokensCol` < 0,
         |  cast(raise_error(concat('packChunks: $tokensCol must be a non-negative integer, got ',
         |    coalesce(cast(`$tokensCol` as string), 'NULL'))) as bigint),
         |  cast(`$tokensCol` as bigint))""".stripMargin)
    val w = Window.partitionBy("shard").orderBy("__hval", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__hval", Sampling.bucketPpm(idCol)) // guarded hash position
      .withColumn("shard", col("__hval") % nShards)
      .withColumn("__n", toks)
      .withColumn("start_tok", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("chunk_first", expr(s"start_tok DIV ${ctxTokens}L"))
      .withColumn("chunk_last",
        expr(s"if(__n > 0, (start_tok + __n - 1) DIV ${ctxTokens}L, start_tok DIV ${ctxTokens}L)"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + lit(1L))
  }

  /** Length-bucketed BATCHING plan — the padding-efficiency layout for
    * padded (non-packed) training and for inference serving: documents
    * group into power-of-two length buckets (`bucket` = bit length of the
    * token count, so bucket b holds 2^(b-1)..2^b-1 tokens and the
    * worst-case padding within any batch is < 2x, vs unbounded for
    * random batching), and each (shard, bucket) stream is cut into
    * `batchSize`-doc batches in deterministic hash order. Pure integer —
    * the bit-length log2 idiom the surprisal operators use, exact on any
    * engine.
    *
    * Scale shape: the position window partitions by (shard, bucket) —
    * parallel streams bounded by |corpus|/nShards, never a global order;
    * bucket assignment and batch arithmetic are scan-side. A training
    * loader reads `(shard, bucket, batch_idx)` groups; every batch's docs
    * agree on the bucket by construction, so its padded width is the
    * bucket ceiling.
    *
    * @return docs columns + bucket, shard, pos (1-based within
    *         (shard, bucket)), batch_idx (0-based)
    */
  def lengthBuckets(
      docs: DataFrame,
      batchSize: Long,
      nShards: Int,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(batchSize > 0, s"lengthBuckets: batchSize must be positive, got $batchSize")
    require(nShards > 0, s"lengthBuckets: nShards must be positive, got $nShards")
    val missing = Seq(idCol, tokensCol).filterNot(docs.columns.contains)
    require(missing.isEmpty, s"columns absent from docs: ${missing.mkString(", ")}")
    val reserved = Seq("__hval", "bucket", "shard", "pos", "batch_idx")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")
    val w = Window.partitionBy("shard", "bucket").orderBy(col("__hval"), col(idCol))
    docs
      .withColumn("bucket", expr(
        s"""if(`$tokensCol` is null or `$tokensCol` < 0,
           |  cast(raise_error(concat('lengthBuckets: $tokensCol must be a non-negative integer, got ',
           |    coalesce(cast(`$tokensCol` as string), 'NULL'))) as bigint),
           |  if(`$tokensCol` = 0, 0L, cast(length(bin(cast(`$tokensCol` as bigint))) as bigint)))"""
          .stripMargin))
      .withColumn("__hval", Sampling.bucketPpm(idCol))
      .withColumn("shard", col("__hval") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(pos - 1L) div ${batchSize}L"))
      .drop("__hval")
  }

  /** Deterministic EPOCH-seeded shard layout: every epoch sees the corpus
    * in a fresh, independent pseudo-random order — the per-epoch reshuffle
    * every training loop performs, as a declarative layout instead of a
    * runtime shuffle. [[packChunks]]' multiplicative hash cannot provide
    * this: changing its additive constant only ROTATES the bucket values,
    * so the doc order between two "seeds" would be nearly identical. The
    * epoch key here is `md5(epoch || ':' || id)` — avalanche, so epoch
    * n and n+1 orders are uncorrelated — and the shard is the key's first
    * 8 hex digits mod `nShards` (a doc also MOVES across shards between
    * epochs, so a shard-per-worker reader sees fresh data composition
    * every epoch, not just a reordered local shard).
    *
    * Scale shape: the position window partitions by shard — nShards
    * independent sequential streams, sized to cluster parallelism, each
    * |corpus|/nShards rows (md5 uniformity); nothing global. Writing the
    * layout is then `repartition(shard) + sortWithinPartitions(pos)` —
    * one exchange, and the files ARE the epoch's training order.
    * Deterministic end to end: no rand(), so task retries and re-runs
    * (and a replaying engine) produce the identical layout.
    *
    * @return docs columns + `shard` and `pos` (1-based contiguous within
    *         the shard, ordered by the epoch key with id tiebreak —
    *         md5 collisions cannot make the layout ambiguous)
    */
  /** Proportional mixture INTERLEAVE: an ordering key under which the
    * strata of a sampled mixture appear in proportion to their weights,
    * evenly spread — a training loader reading the sorted stream sees
    * "3 parts code, 1 part books" continuously, instead of the
    * source-clumped runs a plain sort or hash order produces (clumping is
    * the classic curriculum accident: hours of one domain in a row).
    * Classic stride scheduling: the p-th doc (1-based, deterministic
    * hash order) of a stratum with weight w gets
    * `ikey = (2p - 1) * 1e6 div (2 w)` — stratum i's docs sit at odd
    * multiples of 1/(2 w_i), so any prefix of the merged order holds each
    * stratum in weight proportion with discrepancy <= 1 doc.
    *
    * Scale shape: docs hash-shard FIRST ([[Sampling.bucketPpm]], the
    * packing convention), and the position window partitions by (shard,
    * stratum) — per-shard-per-stratum sequential streams, bounded by
    * |corpus| / nShards, never a global order. Each shard's sorted
    * stream is independently proportionally mixed, which is exactly the
    * per-worker training layout. Strata absent from `weights` are
    * dropped (the config IS the mixture); weights must be positive.
    *
    * @return docs columns + shard, pos (1-based within (shard, stratum)),
    *         ikey — write with `repartition(shard) +
    *         sortWithinPartitions(ikey, stratumCol, idCol)`
    */
  def interleaveByWeight(
      docs: DataFrame,
      stratumCol: String,
      weights: Map[String, Long],
      nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "interleaveByWeight: weights must be non-empty")
    weights.foreach { case (s, w) =>
      require(w > 0 && w <= 1000000000L,
        s"interleaveByWeight: weight for '$s' must be in [1, 1e9], got $w")
    }
    require(nShards > 0, s"interleaveByWeight: nShards must be positive, got $nShards")
    val reserved = Seq("__hval", "__w", "shard", "pos", "ikey").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")
    val w = Window.partitionBy("shard", stratumCol).orderBy(col("__hval"), col(idCol))
    docs
      .withColumn("__w", element_at(typedLit(weights), col(stratumCol)))
      .where(col("__w").isNotNull) // unlisted strata: dropped
      .withColumn("__hval", Sampling.bucketPpm(idCol))
      .withColumn("shard", col("__hval") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("ikey", expr("(2L * pos - 1L) * 1000000L div (2L * __w)"))
      .drop("__w", "__hval")
  }

  def epochShuffle(
      docs: DataFrame,
      nShards: Int,
      epoch: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"epochShuffle: nShards must be positive, got $nShards")
    require(epoch >= 0, s"epochShuffle: epoch must be >= 0, got $epoch")
    require(docs.columns.contains(idCol), s"column absent from docs: $idCol")
    val reserved = Seq("__ekey", "shard", "pos").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")
    val w = Window.partitionBy("shard").orderBy(col("__ekey"), col(idCol))
    docs
      .withColumn("__ekey",
        expr(s"md5(concat('$epoch', ':', cast(`$idCol` as string)))"))
      // first 8 hex digits -> [0, 2^32): positive, so % is a true modulus
      .withColumn("shard",
        expr(s"cast(conv(substring(__ekey, 1, 8), 16, 10) as bigint) % $nShards"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__ekey")
  }

  /** CHUNK-WITH-OVERLAP — the embedding/retrieval-side splitter, dual to
    * [[packChunks]]: packing CONCATENATES short docs up to the context
    * length for training; this SPLITS long docs into fixed-token windows
    * with overlap so each chunk embeds/retrieves with boundary context
    * (the standard RAG splitter). Chunks start every `chunkTokens -
    * overlapTokens` tokens; the last chunk may be short; empty docs emit
    * nothing. `chunk_md5` fingerprints the chunk's token slice
    * (order-exact), so downstream embedding stores can key dedup/caching
    * on content.
    *
    * Scale shape: entirely scan-side — tokenize, a per-row chunk-count
    * formula, one Generate (explode of the chunk index range), and
    * per-chunk slicing of the row's own token array. No shuffle, no
    * window, no join; legal in a stateless streaming projection as-is.
    */
  def chunkWithOverlap(
      docs: DataFrame,
      chunkTokens: Int,
      overlapTokens: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkWithOverlap: chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkWithOverlap: overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    import graft.pipeline.TextOps.toksS
    docs
      .select(col(idCol), expr(toksS(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .where(col("__n") > 0)
      .withColumn("__k",
        expr(s"IF(__n <= $chunkTokens, 0L, (__n - $chunkTokens + $stride - 1) DIV $stride)"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(expr("sequence(0L, __k)")).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_end", least(col("tok_start") + chunkTokens, col("__n")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"), col("tok_end"),
        (col("tok_end") - col("tok_start")).as("n_chunk_tokens"),
        md5(concat_ws(" ", expr(
          "slice(__toks, cast(tok_start as int) + 1, cast(tok_end - tok_start as int))")))
          .as("chunk_md5"))
  }

  /** SHARD MANIFEST — the provenance record a corpus build publishes next
    * to its training shards so a consumer (or a re-run) can verify the
    * layout bit-for-bit without re-reading the data: per shard, the doc
    * count, the token total, and an ORDER-EXACT content fingerprint of
    * the (position, doc id) assignment.
    *
    * The fingerprint is `bit_xor` over rows of a 60-bit md5-derived hash
    * of "pos:id". Position is baked into every term, so any reorder,
    * drop, duplicate, or swap changes the result — order-exact — yet XOR
    * commutes, so the aggregate is map-side combinable with O(1) state.
    * The tempting alternative (md5 of the collect_list of ids in position
    * order) materializes a corpus/nShards-sized array per group — a
    * driver-of-the-executor-world memory cliff at 100 TB. 60 bits (15 hex
    * chars) keeps `conv` exact (16^15 < 2^63; all 32 hex chars would
    * overflow the bigint parse).
    *
    * Input is an [[epochShuffle]]/[[lengthBuckets]]-shaped frame carrying
    * `shard`, `pos`, and optionally `n_tokens` (token totals are reported
    * when present, omitted when not).
    */
  def shardManifest(placed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    require(Seq("shard", "pos", idCol).forall(placed.columns.contains),
      s"shardManifest needs 'shard', 'pos', '$idCol', got ${placed.columns.mkString(", ")}")
    val fp = expr(
      s"""bit_xor(cast(conv(substr(md5(concat(cast(pos as string), ':',
         |  cast(`$idCol` as string))), 1, 15), 16, 10) as bigint))""".stripMargin
        .replace("\n", " ")).as("fingerprint")
    val aggs =
      if (placed.columns.contains("n_tokens"))
        Seq(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"), fp)
      else Seq(count(lit(1)).as("n_docs"), fp)
    placed.groupBy("shard").agg(aggs.head, aggs.tail: _*)
  }
}
