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

  /** Stopword-marker language heuristic (argmax of per-language marker
    * counts, precedence en>es>de>fr, 'und' when no markers hit).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs
      .withColumn("toks", expr(toksS(textCol)))
      .withColumns(langMarkers.map(_._1).map(l => s"s_$l" -> expr(langScoreS(l))).toMap)
    scored.select(col(idCol), expr(heurLangS).as("heur_lang"))
  }

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
}
