package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language ID,
  * document fingerprinting. All scan-side (no shuffle), all integer
  * outputs (ppm fixed-point) so results are deterministic and
  * oracle-comparable across engines.
  */
object TextAnalysis {
  import TextOps._

  /** Token/char statistics per document. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("toks", expr(toksS(textCol)))
      .select(
        col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr(s"size(array_distinct(toks))").cast("long").as("n_distinct"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t)) * 1000000 DIV greatest(size(toks), 1)")
          .as("avg_token_len_ppm"),
        expr("size(array_distinct(toks)) * 1000000 DIV greatest(size(toks), 1)")
          .as("distinct_ppm"))

  /** Quality score in ppm: rewards length (capped) and lexical diversity.
    * Deterministic integer formula — a stand-in for model-based quality
    * classifiers with identical pipeline shape.
    */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenStats(docs, idCol, textCol)
      .select(col(idCol),
        expr("least(least(n_tokens, 100) * 5000 + distinct_ppm DIV 2, 1000000)").as("quality_ppm"))

  /** Gopher/Dolma-style composite keep/drop filter — the rule stack a
    * pretraining pipeline actually applies, composed from the existing
    * integer metrics ([[tokenStats]], [[repetitionStats]]) so every
    * threshold compare is deterministic and oracle-replicable. Emits the
    * decision AND a `drop_reasons` bitmask (bit 0 too-few-tokens, 1
    * too-many, 2 token-length out of band, 3 low lexical diversity, 4
    * duplicate bigrams, 5 duplicate trigrams) — pipelines keep the mask
    * for filter-rate dashboards and ablations, not just the boolean.
    * Thresholds are ppm integers; defaults adapt the published Gopher
    * rules to this engine's fixed-point convention.
    */
  def gopherFilter(
      docs: DataFrame,
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minAvgTokenLenPpm: Long = 3000000L,
      maxAvgTokenLenPpm: Long = 10000000L,
      minDistinctPpm: Long = 200000L,
      maxDupBigramPpm: Long = 200000L,
      maxDupTrigramPpm: Long = 300000L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val reasons = expr(
      s"""cast(n_tokens < ${minTokens}L as bigint) * 1
         | + cast(n_tokens > ${maxTokens}L as bigint) * 2
         | + cast(avg_token_len_ppm < ${minAvgTokenLenPpm}L
         |        or avg_token_len_ppm > ${maxAvgTokenLenPpm}L as bigint) * 4
         | + cast(distinct_ppm < ${minDistinctPpm}L as bigint) * 8
         | + cast(dup_bigram_ppm > ${maxDupBigramPpm}L as bigint) * 16
         | + cast(dup_trigram_ppm > ${maxDupTrigramPpm}L as bigint) * 32""".stripMargin)
    tokenStats(docs, idCol, textCol)
      .join(repetitionStats(docs, idCol, textCol), Seq(idCol))
      .withColumn("drop_reasons", reasons)
      .select(col(idCol),
        (col("drop_reasons") === 0L).cast("bigint").as("keep"),
        col("drop_reasons"))
  }

  /** Stopword-marker language heuristic (argmax of per-language marker
    * counts, precedence en>es>de>fr, 'und' when no markers hit).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs
      .withColumn("toks", expr(toksS(textCol)))
      .withColumns(langMarkers.map(_._1).map(l => s"s_$l" -> expr(langScoreS(l))).toMap)
    scored.select(col(idCol), expr(heurLangS).as("heur_lang"))
  }

  /** Gopher-style within-document repetition: duplicate bigram/trigram
    * fractions in ppm (a high duplicate fraction marks template/spam-like
    * text that repeats itself). Relational form: posexplode tokens once,
    * n-grams via window lead (codegen'd), two narrow per-doc aggregations.
    * Docs too short for an n-gram report 0 (nothing repeats).
    */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    val grams = docs
      .select(col(idCol), posexplode(expr(toksS(textCol))).as(Seq("pos", "t")))
      .withColumn("t2", lead("t", 1).over(w))
      .withColumn("t3", lead("t", 2).over(w))
    val bi = grams.where(col("t2").isNotNull)
      .select(col(idCol), concat_ws(" ", col("t"), col("t2")).as("g"))
      .groupBy(idCol).agg(count(lit(1)).as("n_bi"), countDistinct(col("g")).as("d_bi"))
    val tri = grams.where(col("t3").isNotNull)
      .select(col(idCol), concat_ws(" ", col("t"), col("t2"), col("t3")).as("g"))
      .groupBy(idCol).agg(count(lit(1)).as("n_tri"), countDistinct(col("g")).as("d_tri"))
    docs.select(col(idCol)).join(bi, Seq(idCol), "left").join(tri, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bigrams"),
        coalesce(expr("(n_bi - d_bi) * 1000000 DIV greatest(n_bi, 1)"), lit(0L))
          .as("dup_bigram_ppm"),
        coalesce(col("n_tri"), lit(0L)).as("n_trigrams"),
        coalesce(expr("(n_tri - d_tri) * 1000000 DIV greatest(n_tri, 1)"), lit(0L))
          .as("dup_trigram_ppm"))
  }

  /** Email pattern for [[piiScrub]] — `[.]` instead of an escaped dot so
    * the same literal parses identically in Java regex (Spark) and RE2
    * (DuckDB oracle).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  /** Phone pattern for [[piiScrub]] (NANP 555 test block). */
  val PhoneRe = "[+]1-555-[0-9]{4}"

  /** Rule-based PII scrub: redact emails and phone numbers with typed
    * placeholder tokens and report per-doc match counts. Scan-side
    * codegen'd regex — the plan shape of every rule-based scrub/filter
    * pass over a 100 TB corpus (no shuffle, pushdown-friendly).
    */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(regexp_replace(
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("scrub_md5"))

  /** Winnowing fingerprints, aggregated per doc (count / min / max / sum of
    * the distinct fingerprint set — order-insensitive on purpose).
    *
    * Relational form: explode 8-gram positions, md5 each gram ONCE, sliding
    * 4-window min via a window frame, distinct, aggregate. One sort per doc
    * partition instead of the combinatorial nested-HOF expression (which
    * would re-hash every gram 4× per window and again per output column).
    */
  def fingerprintStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .where(length(col(textCol)) >= 11)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, length($textCol)-7), j -> substring($textCol, j, 8))"))
        .as(Seq("pos", "gram")))
      .withColumn("h", expr(hashS("gram")))
    val w = Window.partitionBy(idCol).orderBy("pos").rowsBetween(-3, 0)
    val fps = grams
      .withColumn("wmin", min(col("h")).over(w))
      .where(col("pos") >= 3) // full windows only (pos is 0-based)
      .select(col(idCol), col("wmin").as("fp"))
      .distinct()
    val stats = fps.groupBy(idCol).agg(
      count(lit(1)).as("n_fp"),
      min(col("fp")).as("min_fp"),
      max(col("fp")).as("max_fp"),
      sum(col("fp")).as("sum_fp"))
    // docs shorter than 11 chars keep a zero row (parity with the oracle)
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        col("min_fp"), col("max_fp"),
        coalesce(col("sum_fp"), lit(0L)).as("sum_fp"))
  }

  /** BM25-shaped relevance scoring of the corpus against a small query term
    * set, in pure integer arithmetic (the repo's fixed-point convention —
    * `ln`-based IDF rounds differently across engines, so the IDF factor is
    * the rational surrogate `(N - df + 1) / (N + 1)` and the TF saturation
    * keeps BM25's `tf / (tf + k·len-norm)` shape with integer division).
    * Per (doc, term), with the IDF factor reduced to ppm FIRST so no
    * intermediate exceeds ~1e16 even at 1e10 documents (tf·(N−df+1)·1e6
    * would silently wrap Long at corpus scale):
    *
    *   idf_ppm     = (N − df + 1) · 1e6  DIV  (N + 1)
    *   contrib_ppm = tf · idf_ppm  DIV  (tf + 1 + 2·dl DIV avgdl)
    *
    * The plan is the 100 TB shape regardless of the scoring formula:
    * tokens are FILTERED to the query terms scan-side (only hits shuffle —
    * the inverted-index access path), document lengths aggregate per doc
    * once, corpus scalars (N, avgdl) ride in via one broadcast row, and
    * per-term df is a broadcast-joined #terms-row table.
    */
  def bm25Lite(
      docs: DataFrame,
      terms: Seq[String],
      topK: Int = 50,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25Lite needs at least one query term")
    val toks = docs.select(col(idCol), explode(expr(toksS(textCol))).as("t"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      expr("sum(dl) DIV count(1)").as("avgdl"))
    val tf = toks.where(col("t").isin(terms: _*))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "t")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("contrib_ppm", expr(
        "tf * ((n_docs - df + 1) * 1000000L DIV (n_docs + 1)) DIV (tf + 1 + (2 * dl) DIV greatest(avgdl, 1))"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib_ppm")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col(idCol))
      .limit(topK)
  }

  /** Benchmark decontamination: for every training document, how many of
    * its distinct 3-token shingles appear anywhere in the eval corpus, and
    * that count as a ppm share of the document's shingles. Pipelines drop
    * or flag documents above a contamination threshold before training so
    * eval benchmarks stay meaningful.
    *
    * Scale shape: the EVAL side must be the SMALL side (benchmarks —
    * a bounded set of documents, never a corpus share that grows with the
    * data); its distinct shingle set broadcasts, and the training corpus
    * is probed in ONE pass — a broadcast left join that both counts each
    * doc's shingles and its eval hits in a single doc-keyed aggregation
    * (the eval set is distinct, so the join cannot multiply rows). Docs
    * too short to shingle report zeros (never silently dropped — the
    * cluster-election universe lesson).
    */
  def contamination(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val train = Dedup.shingleRows(docs, idCol, textCol)
    val evalSh = Dedup.shingleRows(evalDocs, idCol, textCol)
      .select("sh").distinct().withColumn("hit", lit(1))
    val agg = train.join(broadcast(evalSh), Seq("sh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("coalesce(n_hit, 0L) * 1000000L DIV greatest(coalesce(n_sh, 0L), 1)")
          .as("contaminated_ppm"))
  }
}
