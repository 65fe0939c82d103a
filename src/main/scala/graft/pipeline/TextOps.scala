package graft.pipeline

/** Shared constants + paired expression fragments for the LLM-data-pipeline
  * operators (SURVEY §7 step 8). Every operator here exists twice: as a Spark
  * expression (dialect S) and as DuckDB oracle SQL (dialect D), both generated
  * from the SAME Scala constants so the two can never drift.
  *
  * Portable primitives:
  *  - token hash: first 8 hex chars of md5 → bigint (identical in both engines)
  *  - all arithmetic integer (no FP in any comparison-relevant output)
  *  - tokenization: split on single space, drop empties
  */
object TextOps {

  /** Mersenne prime 2^31-1 — modulus for all affine hash families. */
  val P = 2147483647L

  /** MinHash: K hash functions grouped into BANDS bands of ROWS rows. */
  val K = 32
  val BANDS = 8
  val ROWS = 4

  /** Deterministic affine seeds (a_i ∈ [1,P-1], b_i ∈ [0,P-1]). */
  val seeds: Seq[(Long, Long)] = (0 until K).map { i =>
    (((i * 2654435761L + 1013904223L) % (P - 1)) + 1, (i * 1103515245L + 12345L) % P)
  }

  // ------------------------------------------------------------ primitives

  /** 32-bit token hash from md5 prefix. */
  def hashS(tok: String) = s"cast(conv(substr(md5($tok),1,8),16,10) as bigint)"
  def hashD(tok: String) = s"('0x'||substr(md5($tok),1,8))::BIGINT"

  /** Tokens: split on space, drop empties. */
  def toksS(text: String) = s"filter(split($text,' '), t0 -> length(t0) > 0)"
  def toksD(text: String) = s"list_filter(string_split($text,' '), t0 -> len(t0) > 0)"

  /** Distinct 3-token shingles over a tokens list column named `toks`
    * (oracle side only — the Spark side uses the relational
    * explode+window-lead form in Dedup.shingleRows; the array-HOF form
    * re-evaluates its inputs combinatorially after projection collapse).
    */
  val shinglesD: String =
    """list_distinct(CASE WHEN len(toks) >= 3 THEN
      |  list_transform(generate_series(1, len(toks)-2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |ELSE [] END)""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------------ minhash

  private def seedArrayD = seeds.map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")

  /** MinHash signature (list of K bigints) over a `shingles` column —
    * oracle twin of Dedup.minhashSignature's 32 min-aggregates.
    */
  val minhashSigD: String =
    s"""CASE WHEN len(shingles) = 0 THEN list_transform(generate_series(1,$K), i -> $P)
       |ELSE list_transform($seedArrayD,
       |  sd -> list_min(list_transform(shingles,
       |    t1 -> (sd[1] * ${hashD("t1")} + sd[2]) % $P)))
       |END""".stripMargin.replace("\n", " ")

  /** 32-bit SimHash over the token multiset `toks` — oracle twin of
    * Dedup.simhash's relational bit-sum form.
    */
  val simhashD: String =
    s"""list_sum(list_transform(generate_series(0,31), bi ->
       |  CASE WHEN list_sum(list_transform(toks, t2 ->
       |    CASE WHEN ((${hashD("t2")} >> bi) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN (1::BIGINT << bi) ELSE 0 END))""".stripMargin.replace("\n", " ")

  /** Winnowing fingerprints (char 8-grams, window-4 minima, distinct) over a
    * `text` column — oracle twin of TextAnalysis.fingerprintStats.
    */
  val fingerprintsD: String =
    s"""CASE WHEN len(text) >= 11 THEN list_distinct(
       |  list_transform(generate_series(1, len(text)-10),
       |    j -> list_min(list_transform(generate_series(0,3),
       |      o -> ${hashD("substr(text, j + o, 8)")}))))
       |ELSE [] END""".stripMargin.replace("\n", " ")


  /** Signature agreement in ppm — the MinHash estimate of Jaccard as exact
    * integer arithmetic over two K-component signature columns: the share
    * of positions where the signatures agree. This is the verification
    * metric for INCREMENTAL near-dup probing, where the historical side's
    * text is gone and exact shingle Jaccard is unavailable by design.
    */
  def sigSimS(x: String, y: String): String =
    s"aggregate(zip_with($x, $y, (a1, b1) -> IF(a1 = b1, 1L, 0L)), 0L, (acc2, v2) -> acc2 + v2) * 1000000 DIV $K"
  def sigSimD(x: String, y: String): String =
    s"list_sum(list_transform(generate_series(1,$K), si -> CASE WHEN $x[si] = $y[si] THEN 1 ELSE 0 END)) * 1000000 // $K"

  /** Per-ROW MinHash signature (array<long>) — the streaming face of
    * Dedup.minhashSignature: same shingle derivation (distinct 3-token
    * shingles), same affine family, same min semantics, computed in ONE
    * scan-side expression (no shuffle, no window) so it is legal in a
    * stateless streaming projection. Intermediates are LAMBDA-BOUND via
    * single-element `transform` (a let-binding): each reference to `tks` /
    * `shs` / `hs` is an attribute lookup, so the tokenizer is evaluated
    * once per row — not once per reference, the HOF-inlining trap
    * Dedup.shingleRows documents. Rows with < 3 tokens produce a NULL
    * signature (mirroring the batch aggregate's absent-row semantics):
    * NULL propagates safely through `sigSimS` (null sim_ppm fails every
    * threshold), whereas the earlier all-P sentinel made any two tiny
    * docs perfect near-dups (sim_ppm = 1e6) for a caller that forgot the
    * size>=3 pre-filter.
    */
  def rowSigS(textCol: String): String = {
    val mins = seeds.map { case (a, b) =>
      s"aggregate(hs, ${P}L, (acc4, h1) -> least(acc4, ($a * h1 + $b) % $P))"
    }
    s"""element_at(transform(array(${toksS(textCol)}), tks ->
       |  IF(size(tks) < 3, NULL,
       |    element_at(transform(array(array_distinct(transform(sequence(1, size(tks) - 2),
       |        i2 -> concat_ws(' ', element_at(tks, i2), element_at(tks, i2 + 1), element_at(tks, i2 + 2))))), shs ->
       |      element_at(transform(array(transform(shs, s2 -> ${hashS("s2")})), hs ->
       |        array(${mins.mkString(",")})), 1)), 1))), 1)""".stripMargin.replace("\n", " ")
  }

  /** LSH band hashes: array of BANDS md5 strings over signature slices.
    * The band index is baked into the hashed string so buckets from
    * different bands can never collide and a join on the hash alone is
    * correct.
    */
  val bandHashesS: String =
    s"""transform(sequence(1,$BANDS), bj -> md5(concat(cast(bj as string), ':', concat_ws(',',
       |  transform(sequence(0,${ROWS - 1}), o -> cast(element_at(sig, (bj-1)*$ROWS + 1 + o) as string))))))"""
      .stripMargin.replace("\n", " ")
  val bandHashesD: String =
    s"""list_transform(generate_series(1,$BANDS), bj -> md5(bj::VARCHAR || ':' || array_to_string(
       |  list_transform(generate_series(0,${ROWS - 1}), o -> sig[(bj-1)*$ROWS + 1 + o]::VARCHAR), ',')))"""
      .stripMargin.replace("\n", " ")

  // ------------------------------------------------------------ simhash


  // ------------------------------------------------------------ fingerprint


  // ------------------------------------------------------------ lang-id

  /** Marker-token sets for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def inSetS(tok: String, set: Seq[String]) =
    s"CASE WHEN $tok IN (${set.map(s => s"'$s'").mkString(",")}) THEN 1 ELSE 0 END"

  def langScoreS(lang: String): String = {
    val set = langMarkers.find(_._1 == lang).get._2
    s"aggregate(toks, 0L, (acc3, t3) -> acc3 + ${inSetS("t3", set)})"
  }
  def langScoreD(lang: String): String = {
    val set = langMarkers.find(_._1 == lang).get._2
    s"list_sum(list_transform(toks, t3 -> ${inSetS("t3", set)}))"
  }

  /** argmax with fixed precedence en>es>de>fr, fallback 'und' when 0. */
  val heurLangS: String = {
    val cmp = langMarkers.map(_._1).map(l => s"s_$l").toList
    s"""CASE WHEN greatest(${cmp.mkString(",")}) = 0 THEN 'und'
       |${langMarkers.map(_._1).map(l => s"WHEN s_$l = greatest(${cmp.mkString(",")}) THEN '$l'").mkString(" ")}
       |END""".stripMargin.replace("\n", " ")
  }
  val heurLangD: String = heurLangS // same SQL shape works in DuckDB
}
