package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding (BPE) tokenization as a scan-side expression —
  * the subword token counts every token-denominated operator in this
  * package (Packing, Sampling.mixtureByBudget, TextAnalysis.vocabCoverage,
  * surprisal) should run on, instead of the whitespace-token
  * approximation.
  *
  * Reference analog: the fixed library-kernel discipline of
  * borsa-core/src/timeseries/resample.rs:26-121 — a deterministic,
  * unit-tested kernel with no configurable fuzz. The merge table is a
  * LITERAL (the model ships with the engine build, like a tokenizer's
  * merges.txt rides with the trained model), so the whole encode compiles
  * to codegen'd higher-order functions over the token array: per word,
  * split to characters, then apply each merge rule in rank order. No
  * shuffle, no UDF, no driver loop — the classic Spark-first shape for a
  * per-row kernel.
  *
  * ALGORITHM EQUIVALENCE (why rank-order exhaustive application == the
  * classic greedy lowest-rank-anywhere encode): the merge list is
  * WELL-FORMED — every compound symbol referenced by a rule is produced
  * by an EARLIER rule (validated at class load). Applying rule i can only
  * create its own output symbol `a+b`; any rule mentioning `a+b` must
  * come after i, and merging two symbols into one never creates a new
  * adjacency of two pre-existing symbols. So once rules 1..i-1 are
  * exhausted, rule i can never re-enable them — applying rules in rank
  * order exhaustively visits exactly the merges the greedy
  * lowest-rank-first loop performs (asserted against a literal greedy
  * reference implementation in BpeSpec).
  *
  * SIMULTANEOUS-MERGE FORM (why one pass per rule suffices): every rule
  * has left != right (validated), so two match positions can never be
  * adjacent (positions i and i+1 both matching forces a = b). All
  * occurrences of the pair in a word are therefore disjoint and merge in
  * ONE positional pass — no sequential fold, no fixpoint iteration per
  * rule.
  */
object Bpe {
  import TextOps.{toksS, toksD}

  /** Ordered merge rules; rank = position (0-based). Compound vocabulary
    * ids are VOCAB_BASE + rank (single characters keep their code point, the
    * byte-vocab convention).
    */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"),   // th   (id VOCAB_BASE + 0)
    ("th", "e"),  // the  (id 257)
    ("i", "n"),   // in   (id 258)
    ("a", "n"),   // an   (id 259)
    ("an", "d"),  // and  (id 260)
    ("e", "r"),   // er   (id 261)
    ("o", "n"),   // on   (id 262)
    ("r", "e"),   // re   (id 263)
    ("in", "g"),  // ing  (id 264)
    ("o", "r"),   // or   (id 265)
    ("s", "t"),   // st   (id 266)
    ("a", "t"))   // at   (id 267)

  /** Compound-id base: one ABOVE the Unicode code-point range
    * (0x10FFFF), so compound ids can never collide with a single
    * character's own code point. The previous base of 256 followed the
    * byte-vocab convention but this vocabulary's atoms are CODE POINTS,
    * not bytes — 'Ā' (U+0100 = 256) would have encoded as compound rank
    * 0 and decoded as "th". Any id below the base is, by construction, a
    * character id.
    */
  val VOCAB_BASE: Int = 0x110000

  /** Compound symbol → integer id (VOCAB_BASE + rank) for any merge table. */
  def vocabIdsOf(ms: Seq[(String, String)]): Map[String, Int] =
    ms.zipWithIndex.map { case ((a, b), i) => (a + b) -> (VOCAB_BASE + i) }.toMap

  /** Compound symbol → integer id for the shipped table. */
  val vocabIds: Map[String, Int] = vocabIdsOf(merges)

  /** FROZEN TRAINED merge table — [[train]] run once over the sf0.01
    * `documents` corpus (nMerges = 16, minCount = 2, via
    * [[TrainBpeTool]]) and baked as a literal, the
    * [[graft.pipeline.Similarity.refPqCodebooks]] discipline for model
    * artifacts: training is a one-time offline job, serving folds the
    * frozen constants into the scan, and the DuckDB oracle is generated
    * from the SAME literal so the two engines cannot drift. BpeSpec
    * asserts this table equals a fresh [[train]] on the same corpus
    * (drift between the literal and the trainer fails the suite); note
    * it learned whole corpus words ("join", "hash", "row") — the
    * Zipfian-head behavior real BPE training shows. 16 rules, not more:
    * each rule adds a nested lambda level, and past ~20 the chain
    * exceeds Catalyst's default analyzer-resolution budget
    * (spark.sql.analyzer.maxIterations = 100) — a table much larger than
    * that belongs in the dictionary path ([[docTokenCounts]]'s per-word
    * broadcast), not in a per-row expression chain.
    */
  val refTrainedMerges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"))
  validate(refTrainedMerges)

  /** Fail-fast validation of the two structural properties the expression
    * form depends on (see the object scaladoc). Public so specs can
    * assert malformed tables are rejected.
    */
  def validate(ms: Seq[(String, String)]): Unit = {
    val produced = scala.collection.mutable.Set.empty[String]
    ms.zipWithIndex.foreach { case ((a, b), i) =>
      require(a.nonEmpty && b.nonEmpty, s"Bpe rule $i: empty symbol")
      require(a != b,
        s"Bpe rule $i: left == right ('$a') — adjacent occurrences would " +
          "overlap and the simultaneous-merge form would be unsound")
      Seq(a, b).foreach { s =>
        require(s.length == 1 || produced.contains(s),
          s"Bpe rule $i references compound symbol '$s' before any earlier " +
            "rule produces it — the merge list is not well-formed, and " +
            "rank-order application would diverge from greedy BPE")
      }
      require(!produced.contains(a + b),
        s"Bpe rule $i produces '$a$b' twice")
      produced += (a + b)
    }
  }
  validate(merges)

  // ------------------------------------------------------------ expressions

  /** String-literal escapes for symbols embedded in generated
    * expressions — shipped merges are plain letters, but TRAINED tables
    * carry arbitrary corpus characters (apostrophes, backslashes).
    * Spark escapes with backslash; DuckDB doubles the quote.
    */
  private def lit1(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")
  private def lit1D(s: String): String = s.replace("'", "''")

  /** One merge-rule application over a symbol-array lambda variable `sv`:
    * merged pairs emit their concatenation at the left position, the
    * consumed right position emits NULL, everything else passes through;
    * the filter drops the NULLs. All positions merge in one pass — sound
    * because left != right (see scaladoc).
    */
  private def applyRuleS(sv: String, k: Int, a0: String, b0: String, rawW: Option[String] = None): String = {
    val (a, b, ab) = (lit1(a0), lit1(b0), lit1(a0 + b0))
    // two skip guards, cheap-first. (1) instr: symbols are contiguous
    // substrings of the word in order, so adjacent symbols a,b imply the
    // word's RAW TEXT contains a+b — a native substring search over the
    // word (no lambda machinery) rules out most (rule, word) pairs.
    // (2) exists: the pair's symbols exist but are not adjacent at this
    // level. Both skip the two-array rebuild — the overwhelmingly common
    // case (a word matches a handful of the rule table); Or-expressions
    // short-circuit, so the positional scan only runs on instr hits
    // rawW = None when no raw-text column is in scope (the trainer's dict
    // pass, where the rule is known to be corpus-frequent anyway)
    val instrGuard = rawW.map(w => s"instr($w, '$ab') = 0 OR ").getOrElse("")
    s"""IF($instrGuard NOT exists(sequence(1, size($sv)), g$k ->
       |     g$k < size($sv) AND element_at($sv, g$k) = '$a' AND element_at($sv, g$k + 1) = '$b'), $sv,
       |   filter(transform(sequence(1, size($sv)), i$k ->
       |     CASE WHEN i$k < size($sv) AND element_at($sv, i$k) = '$a' AND element_at($sv, i$k + 1) = '$b' THEN '$ab'
       |          WHEN i$k > 1 AND element_at($sv, i$k - 1) = '$a' AND element_at($sv, i$k) = '$b' THEN NULL
       |          ELSE element_at($sv, i$k) END), x$k -> x$k IS NOT NULL))""".stripMargin.replace("\n", " ")
  }

  private def applyRuleD(sv: String, k: Int, a0: String, b0: String): String = {
    val (a, b, ab) = (lit1D(a0), lit1D(b0), lit1D(a0 + b0))
    s"""list_filter(list_transform(generate_series(1, len($sv)), i$k ->
       |  CASE WHEN i$k < len($sv) AND $sv[i$k] = '$a' AND $sv[i$k + 1] = '$b' THEN '$ab'
       |       WHEN i$k > 1 AND $sv[i$k - 1] = '$a' AND $sv[i$k] = '$b' THEN NULL
       |       ELSE $sv[i$k] END), x$k -> x$k IS NOT NULL)""".stripMargin.replace("\n", " ")
  }

  /** BPE symbols of one word (a lambda variable): characters, then every
    * rule in rank order. Each level is LAMBDA-BOUND via the
    * single-element-transform let-binding (the rowSigS discipline): the
    * rule body references its input array ~6 times, and without the
    * binding CollapseProject would inline the whole lower pipeline into
    * each reference — 6^rules evaluations per word.
    */
  private def wordSymsS(w: String, ms: Seq[(String, String)] = merges): String = {
    val chars = s"transform(sequence(1, length($w)), c0 -> substr($w, c0, 1))"
    ms.zipWithIndex.foldLeft(chars) { case (acc, ((a, b), i)) =>
      val k = i + 1
      s"element_at(transform(array($acc), s$k -> ${applyRuleS(s"s$k", k, a, b, Some(w))}), 1)"
    }
  }

  private def wordSymsD(w: String, ms: Seq[(String, String)] = merges): String = {
    val chars = s"list_transform(generate_series(1, len($w)), c0 -> $w[c0])"
    ms.zipWithIndex.foldLeft(chars) { case (acc, ((a, b), i)) =>
      val k = i + 1
      s"list_transform([$acc], s$k -> ${applyRuleD(s"s$k", k, a, b)})[1]"
    }
  }

  /** Per-document BPE symbol array (document order preserved: words in
    * token order, symbols in word order). `ms` swaps in a TRAINED merge
    * table ([[train]]) for the shipped literal.
    */
  def symsS(textCol: String): String = symsWithS(textCol, merges)
  def symsWithS(textCol: String, ms: Seq[(String, String)]): String = {
    validate(ms)
    s"flatten(transform(${toksS(textCol)}, w0 -> ${wordSymsS("w0", ms)}))"
  }
  def symsD(textCol: String): String = symsWithD(textCol, merges)
  def symsWithD(textCol: String, ms: Seq[(String, String)]): String =
    s"flatten(list_transform(${toksD(textCol)}, w0 -> ${wordSymsD("w0", ms)}))"

  /** DETERMINISTIC DISTRIBUTED BPE TRAINING — learn a merge table from
    * the corpus instead of shipping one (the [[KMeans.train]] discipline
    * applied to the tokenizer: train and serve from the same engine).
    *
    * Standard BPE training loop on the WORD-COUNT DICTIONARY (Sennrich):
    * the corpus collapses to (word, count) once — vocabulary is Zipfian,
    * so the dict is vocab-sized — and every round is ONE vocab-sized
    * aggregation: explode each dict word's adjacent symbol pairs weighted
    * by the word's count, pick the most frequent pair (ties broken
    * lexically — total order, so identical corpora train identical
    * tables), merge it into the dict scan-side, repeat. Only one
    * (pair, count) row reaches the driver per round — model-sized, the
    * control-plane convention.
    *
    * Departure from textbook BPE, documented: candidate pairs with
    * left == right (e.g. doubling 'aa') are SKIPPED, because the
    * engine's encoder applies each rule as one simultaneous positional
    * pass, which is only sound for left != right (see the object
    * scaladoc). Every trained table therefore passes [[validate]] and
    * composes with [[symsWithS]] / the greedy reference directly.
    * Training stops early when no pair occurs at least `minCount` times.
    */
  def train(
      docs: DataFrame,
      nMerges: Int,
      minCount: Long = 2L,
      textCol: String = "text"): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    var dict = docs.select(explode(expr(toksS(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(expr("transform(sequence(1, length(w)), c0 -> substr(w, c0, 1))").as("syms"),
        col("c"))
    // per-round lineage truncation via the SHARED helper so BPE training
    // honors the engine-wide spark.graft.reliableCheckpoint switch like
    // every other iterative operator (ADVICE r20 — the bare
    // localCheckpoint left unrecoverable local blocks on reliable runs)
    dict = Checkpoints.iterCheckpoint(dict, "Bpe.train")
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (learned.size < nMerges && !exhausted) {
      // adjacent symbol pairs of every dict word, weighted by word count;
      // left == right pairs excluded (encoder soundness — see scaladoc)
      val best = dict
        .select(explode(expr(
          """filter(zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1),
            |  (pa, pb) -> struct(pa as a, pb as b)), p0 -> p0.a != p0.b)"""
            .stripMargin.replace("\n", " "))).as("p"), col("c"))
        .groupBy("p").agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("p.a"), col("p.b"))
        .limit(1)
        .collect()
      best.headOption.filter(_.getLong(1) >= minCount) match {
        case None => exhausted = true
        case Some(row) =>
          val p = row.getStruct(0)
          val (a, b) = (p.getString(0), p.getString(1))
          learned += ((a, b))
          // apply the new rule to the dict (the encoder's positional pass)
          dict = Checkpoints.iterCheckpoint(dict
            .select(expr(applyRuleS("syms", learned.size, a, b)).as("syms"), col("c")),
            "Bpe.train")
      }
    }
    learned.toSeq
  }

  /** Symbol → integer id over a symbol lambda variable: code point for
    * single characters, VOCAB_BASE + rank for compounds. The -1 arm is
    * unreachable (every multi-char symbol is produced by a rule — the
    * well-formedness invariant).
    */
  private def idOfS(sy: String, ms: Seq[(String, String)] = merges): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN '${lit1(s)}' THEN $id" }.mkString(" ")
    s"CASE WHEN length($sy) = 1 THEN ascii($sy) ELSE CASE $sy $compounds ELSE -1 END END"
  }
  private def idOfD(sy: String, ms: Seq[(String, String)] = merges): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN '${lit1D(s)}' THEN $id" }.mkString(" ")
    s"CASE WHEN len($sy) = 1 THEN ascii($sy) ELSE CASE $sy $compounds ELSE -1 END END"
  }

  /** Symbol of one integer id — the inverse of [[idOfS]]: code point back
    * to its character below VOCAB_BASE, compound rank back to its merged
    * string. Character decode is `format_string('%c', id)` on the Spark
    * side (DuckDB: `chr`) because Spark's `char(n)` is MOD-256 — it would
    * silently corrupt every non-Latin-1 code point.
    * Ids outside the vocabulary decode to NULL (which `concat_ws`
    * skips — a corrupted stream surfaces as a round-trip mismatch, not
    * a crash). The character arm is range-guarded: negative ids and the
    * UTF-16 surrogate block (U+D800–U+DFFF, not characters) would make
    * `format_string('%c', ...)` throw `IllegalFormatCodePointException`
    * (DuckDB's `chr` likewise errors), so a hostile external id stream
    * must fall through to NULL before the formatter ever sees it.
    */
  private def symOfS(idv: String): String = {
    val compounds = vocabIds.toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN $id THEN '${lit1(s)}'" }.mkString(" ")
    s"CASE WHEN $idv >= 0 AND $idv < $VOCAB_BASE " +
      s"AND NOT ($idv BETWEEN 55296 AND 57343) " +
      s"THEN format_string('%c', cast($idv as int)) " +
      s"ELSE CASE $idv $compounds ELSE NULL END END"
  }
  private def symOfD(idv: String): String = {
    val compounds = vocabIds.toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN $id THEN '${lit1D(s)}'" }.mkString(" ")
    s"CASE WHEN $idv >= 0 AND $idv < $VOCAB_BASE " +
      s"AND NOT ($idv BETWEEN 55296 AND 57343) " +
      s"THEN chr(($idv)::INT) ELSE CASE $idv $compounds ELSE NULL END END"
  }

  /** DECODE an id array back to text — the inverse every tokenizer ships
    * (inspection, sampling dashboards, loss-masking audits decode what
    * the loader packed). Scan-side, like the encode. CONTRACT: whitespace
    * is not in this vocabulary (the tokenizer splits on it), so decoding
    * a document's flat id stream yields the SPACE-STRIPPED normalized
    * text; per WORD the round trip is exact (spec-asserted over the
    * seeded fuzz corpus). The SPACED stream ([[symsSpacedS]]) carries the
    * space-marker symbol (id 32) between words — the SentencePiece/GPT-2
    * convention reduced to this vocabulary's whitespace model — and
    * decodes BYTE-EXACTLY up to the tokenizer's own normalization (runs
    * of spaces collapse; leading/trailing spaces strip, because
    * `split(text, ' ')` drops empties). The decode itself is
    * convention-free (ids → symbols → concat) and serves both streams.
    */
  def decodeS(idsCol: String): String =
    s"concat_ws('', transform($idsCol, v0 -> ${symOfS("v0")}))"
  def decodeD(idsCol: String): String =
    s"array_to_string(list_transform($idsCol, v0 -> ${symOfD("v0")}), '')"

  /** Per-document symbol stream WITH the space-marker symbol between
    * words — what a production loader actually packs, because its decode
    * is byte-exact (see [[decodeS]]). The space can never merge: every
    * rule's symbols come from space-SPLIT words (trainer and shipped
    * table alike), so ' ' appears in no rule and always survives as a
    * single id-32 token. Built by prepending the marker to EVERY word and
    * slicing off the leading one — one evaluation of the per-word rule
    * chain, where an indexed-lambda CASE would duplicate the whole chain
    * per branch.
    */
  def symsSpacedS(textCol: String): String = symsSpacedWithS(textCol, merges)
  def symsSpacedWithS(textCol: String, ms: Seq[(String, String)]): String = {
    validate(ms)
    val spaced = s"flatten(transform(${toksS(textCol)}, w0 -> concat(array(' '), ${wordSymsS("w0", ms)})))"
    s"element_at(transform(array($spaced), fs0 -> " +
      s"CASE WHEN size(fs0) = 0 THEN fs0 ELSE slice(fs0, 2, size(fs0) - 1) END), 1)"
  }
  def symsSpacedD(textCol: String): String = symsSpacedWithD(textCol, merges)
  def symsSpacedWithD(textCol: String, ms: Seq[(String, String)]): String = {
    val spaced = s"flatten(list_transform(${toksD(textCol)}, w0 -> list_prepend(' ', ${wordSymsD("w0", ms)})))"
    s"list_transform([$spaced], fs0 -> CASE WHEN len(fs0) = 0 THEN fs0 ELSE fs0[2:] END)[1]"
  }

  /** Per-document encode→decode ROUND TRIP audit over the SPACED stream:
    * BPE token count (space markers included — they occupy loader
    * positions), md5 of the decoded text, and whether the decode
    * reproduces the document BYTE-EXACTLY modulo the tokenizer's
    * whitespace normalization (`dd = concat_ws(' ', toks)`: only texts
    * with leading/trailing/doubled spaces differ from their round trip,
    * and those the tokenizer itself normalizes — documented contract).
    * Asserting this corpus-wide is the cheapest end-to-end integrity
    * check of the whole id table.
    *
    * Runs on the DICTIONARY PATH ([[docTokenCounts]]'s discipline): both
    * the per-word merge chain AND the per-id decode (whose
    * `format_string('%c', …)` character formatting is the expensive part
    * of byte-exact decode) execute once per DISTINCT word — the Zipfian
    * vocabulary — then fan back over the (doc, pos, word) occurrence
    * stream via a broadcast join. The round trip stays genuine: each
    * dictionary entry is decode(ids(encode(word))) through the integer id
    * table, exactly what the scan-side form computed per occurrence, and
    * the spaced stream's decode factors per word because the marker
    * (id 32) always decodes to one ' ' between words. The per-doc
    * reassembly (`array_sort(collect_list(struct(pos, dec)))`) is the
    * one cost the scan-side form didn't pay: this audit shuffles the
    * decoded WORD stream once. That trade is right here — the merge
    * chain + formatter cost it removes grows with merge-table depth and
    * per-occurrence volume, while the shuffle is the corpus's token
    * stream at its natural width (measured at sf0.1: 2.87 → under the
    * encode-only query's own floor).
    */
  def decodeRoundTrip(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), expr(toksS(textCol)).as("__toks"))
    val words = base.select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "__w")))
    val ids = s"transform(ws, sy -> ${idOfS("sy")})"
    def entry(w: String) =
      s"""element_at(transform(array(${wordSymsS(w)}), ws ->
         |  named_struct(
         |    '__n', cast(size(ws) as bigint),
         |    '__d', ${decodeS(ids)})), 1)""".stripMargin.replace("\n", " ")
    val perDoc = dictFanBack(words, entry, "__e")
      .select(col(idCol), col("__p"),
        col("__e.__n").as("__n"), col("__e.__d").as("__d"))
      .groupBy(idCol)
      .agg(
        expr("sum(__n) + count(1) - 1").as("n_bpe_tokens"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(__p, __d))), x -> x.__d))")
          .as("__dd"))
    base.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        md5(coalesce(col("__dd"), lit(""))).as("decoded_md5"),
        (coalesce(col("__dd"), lit("")) === concat_ws(" ", col("__toks")))
          .as("roundtrip_ok"))
  }

  /** DuckDB oracle twin of [[decodeRoundTrip]] — generated from the same
    * constants (the [[encodeSqlD]] discipline).
    */
  def decodeRoundTripSqlD: String = {
    val ids = s"list_transform(ss, sy -> ${idOfD("sy")})"
    s"""WITH syms AS (SELECT doc_id, ${toksD("text")} AS toks, ${symsSpacedD("text")} AS ss FROM documents),
       |dec AS (SELECT doc_id, toks, ss, ${decodeD(ids)} AS dd FROM syms)
       |SELECT doc_id,
       |  CAST(len(ss) AS BIGINT) AS n_bpe_tokens,
       |  md5(dd) AS decoded_md5,
       |  dd = array_to_string(toks, ' ') AS roundtrip_ok
       |FROM dec ORDER BY doc_id""".stripMargin
  }

  /** BPE token COUNT expression — drop-in for the whitespace
    * `size(toksS(text))` wherever a token-denominated operator takes a
    * token count (packChunks, mixtureByBudget, vocab budgets): the
    * subword count is what a trainer's context length is actually
    * denominated in.
    */
  def nTokensS(textCol: String): String = s"size(${symsS(textCol)})"
  def nTokensD(textCol: String): String = s"len(${symsD(textCol)})"

  /** BROADCAST-CEILING GUARD for the dictionary path. The per-word
    * kernel runs once per distinct word and fans back over the
    * occurrence stream via a broadcast join — measured ~5× on every BPE
    * consumer — but the broadcast has a ceiling: a web-scale corpus's
    * distinct-"word" set (typos, URLs-in-text, hex ids) is billions of
    * entries, and Zipf puts nearly all of that CARDINALITY in words seen
    * once, while nearly all of the OCCURRENCE mass stays in the head.
    * So the dictionary is df-capped to words seen at least
    * `spark.graft.bpe.dictMinCount` times (default 2): the broadcast
    * side shrinks to the head the fan-back actually amortizes, and rare
    * words fall back to the SAME kernel evaluated scan-side in the
    * CASE's miss arm. The fallback does no extra kernel work — a word
    * below the floor occurs fewer times than the floor, so inline
    * evaluation at its occurrences costs no more than one dictionary
    * entry would — and it never ships the tail to every executor.
    *
    * Output values are INVARIANT to the setting (spec-asserted):
    * minCount=1 is the pure dictionary path (everything broadcasts, the
    * miss arm is dead); a huge minCount degenerates to the pure
    * scan-side form (empty dictionary, every row computes inline). Both
    * branches are the same expression STRING, so they cannot drift.
    *
    * Returns `words` plus `outCol` = entryExprS("__w"). entryExprS must
    * be deterministic and non-null for non-null words (join misses are
    * detected by `outCol IS NULL`).
    */
  private def dictFanBack(
      words: DataFrame,
      entryExprS: String => String,
      outCol: String): DataFrame = {
    val minCount = words.sparkSession.conf
      .getOption("spark.graft.bpe.dictMinCount").map(_.toLong).getOrElse(2L)
    require(minCount >= 1, s"spark.graft.bpe.dictMinCount must be >= 1, got $minCount")
    val dict = words.groupBy("__w").agg(count(lit(1)).as("__wc"))
      .where(col("__wc") >= minCount)
      .select(col("__w"), expr(entryExprS("__w")).as(outCol))
    words.join(broadcast(dict), Seq("__w"), "left")
      .withColumn(outCol,
        expr(s"CASE WHEN $outCol IS NULL THEN ${entryExprS("__w")} ELSE $outCol END"))
  }

  /** THE DICTIONARY PATH — the scale form for token COUNTING: natural
    * language vocabulary is Zipfian, so distinct words grow far slower
    * than token occurrences, and the per-word BPE cost should be paid
    * once per DISTINCT word and fanned back out by frequency — the
    * per-word cache every production tokenizer keeps (GPT-2's lru_cache
    * per word), expressed relationally. The dictionary is vocab-sized,
    * so it BROADCASTS onto the token stream; the corpus never shuffles
    * for the lookup. Use this wherever only counts matter (packing,
    * mixture budgets, vocab curves); [[encode]] stays scan-side because
    * its id-stream md5 needs the exact token ORDER.
    *
    * Per-document BPE token counts: (idCol, n_bpe_tokens). Zero-token
    * documents report 0 (they never vanish from a packing feed).
    */
  def docTokenCounts(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(expr(toksS(textCol))).as("__w"))
    val counts = dictFanBack(toks, w => s"cast(size(${wordSymsS(w)}) as bigint)", "__nb")
      .groupBy(idCol).agg(sum(col("__nb")).as("n_bpe_tokens"))
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** TOKENIZER FERTILITY by language — BPE tokens per whitespace word,
    * per language: the metric that exposes a tokenizer under-serving a
    * language (a vocab trained on English fragments everything else into
    * near-character streams; fertility 2-3× the trained language's is
    * the classic symptom, and it silently multiplies that language's
    * compute cost and shrinks its effective context). Output per lang:
    * (lang, n_words, n_bpe_tokens, fertility_ppm = bpe*1e6 div words).
    *
    * Scale shape: SCAN-SIDE, deliberately NOT the dictionary path — an
    * aggregation-only consumer keeps nothing per word, so the right plan
    * is one kernel pass per document and ONE lang-keyed aggregation with
    * map-side partials: zero extra shuffles, embarrassingly parallel,
    * and every doc row (empty ones included) reaches the aggregate, so
    * no language can vanish from the report. The round-14 dictionary
    * form paid a word-explode + distinct-word shuffle + broadcast to
    * save kernel evaluations and MEASURED 2.2× slower at sf0.1
    * (0.41 → 0.9+ s) — the amortization only pays when per-word output
    * must survive the join ([[encode]]'s id streams, [[decodeRoundTrip]]'s
    * decoded text), not for a five-row count table.
    */
  def fertilityByLang(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(langCol),
        expr(s"cast(size(${toksS(textCol)}) as bigint)").as("__nw"),
        expr(s"cast(size(${symsS(textCol)}) as bigint)").as("__nb"))
      .groupBy(langCol)
      .agg(sum(col("__nw")).as("n_words"), sum(col("__nb")).as("n_bpe_tokens"))
      .select(col(langCol),
        col("n_words"), col("n_bpe_tokens"),
        expr("n_bpe_tokens * 1000000 DIV greatest(n_words, 1)").as("fertility_ppm"))

  /** DuckDB oracle twin of [[fertilityByLang]] (per-doc scan form — the
    * oracle verifies VALUES, not the plan shape).
    */
  def fertilitySqlD: String =
    s"""WITH syms AS (SELECT lang, ${toksD("text")} AS toks, ${symsD("text")} AS ss FROM documents)
       |SELECT lang,
       |  CAST(sum(len(toks)) AS BIGINT) AS n_words,
       |  CAST(sum(len(ss)) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(len(ss)) * 1000000 // greatest(sum(len(toks)), 1) AS BIGINT) AS fertility_ppm
       |FROM syms GROUP BY lang ORDER BY lang""".stripMargin

  /** Subword vocab-sizing curve via the dictionary path: word counts are
    * one vocab-sized aggregation, BPE runs once per distinct word, and
    * symbol counts weight by word frequency — corpus-sized work is ONE
    * token count aggregation; all BPE cost is vocab-sized. Output schema
    * matches `TextAnalysis.vocabCoverage` (rank, token, cnt, cum_ppm) and
    * the results are identical (spec-asserted) — this is a pure plan
    * optimization.
    */
  def vocabCurve(
      docs: DataFrame,
      topK: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val wc = docs.select(explode(expr(toksS(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__wc"))
    val counts = wc
      .select(explode(expr(wordSymsS("__w"))).as("t"), col("__wc"))
      .groupBy("t").agg(sum(col("__wc")).as("cnt"))
    val total = counts.agg(sum("cnt").as("__total"))
    val top = counts.orderBy(col("cnt").desc, col("t")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("t"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_ppm",
        expr("sum(cnt) over (order by cnt desc, t rows between unbounded preceding and current row) * 1000000L div __total"))
      .select(col("rank"), col("t").as("token"), col("cnt"), col("cum_ppm"))
  }

  /** Per-document encode summary: whitespace token count, BPE token
    * count, and the md5 of the comma-joined id sequence (order-exact —
    * two documents agree iff their full BPE id streams agree).
    *
    * DICTIONARY PATH (the [[decodeRoundTrip]] shape): the per-word merge
    * chain and id table run once per DISTINCT word, each word's ids
    * pre-joined into one comma string; the per-doc stream reassembles in
    * exact order via `array_sort(collect_list(struct(pos, ids)))` and
    * joining per-word strings with ',' is byte-identical to joining the
    * flattened stream. The order-exactness argument that once kept this
    * operator scan-side is answered by the positional reassembly — and
    * the chain cost it removes grows with merge-table depth, which is
    * exactly where the trained tables hurt (measured at sf0.1: shipped
    * 1.96 → 0.60 s, 16-rule trained 2.52 → 0.70 s).
    */
  def encode(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    encodeWith(docs, merges, idCol, textCol)

  /** DuckDB oracle twin of [[encode]] over the `documents` table —
    * generated from the same merge constants so the two dialects cannot
    * drift (the TextOps convention).
    */
  def encodeSqlD: String =
    s"""WITH syms AS (SELECT doc_id, ${toksD("text")} AS toks, ${symsD("text")} AS ss FROM documents)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(ss) AS BIGINT) AS n_bpe_tokens,
       |  md5(array_to_string(list_transform(ss, sy -> (${idOfD("sy")})::VARCHAR), ',')) AS ids_md5
       |FROM syms ORDER BY doc_id""".stripMargin

  /** [[encode]] with an arbitrary (typically TRAINED) merge table: same
    * output schema, ids are VOCAB_BASE + the table's own ranks. The
    * serving path for [[refTrainedMerges]] — the table folds into the
    * per-distinct-word chain as literals, exactly like the shipped one.
    */
  def encodeWith(
      docs: DataFrame,
      ms: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    validate(ms)
    val base = docs.select(col(idCol), expr(toksS(textCol)).as("__toks"))
    val words = base.select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "__w")))
    def entry(w: String) =
      s"""element_at(transform(array(${wordSymsS(w, ms)}), ws ->
         |  named_struct(
         |    '__n', cast(size(ws) as bigint),
         |    '__ids', concat_ws(',', transform(ws, sy -> cast(${idOfS("sy", ms)} as string))))), 1)"""
        .stripMargin.replace("\n", " ")
    val perDoc = dictFanBack(words, entry, "__e")
      .select(col(idCol), col("__p"),
        col("__e.__n").as("__n"), col("__e.__ids").as("__ids"))
      .groupBy(idCol)
      .agg(
        expr("sum(__n)").as("__nb"),
        expr("concat_ws(',', transform(array_sort(collect_list(struct(__p, __ids))), x -> x.__ids))")
          .as("__idstr"))
    base.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_ws_tokens"),
        coalesce(col("__nb"), lit(0L)).as("n_bpe_tokens"),
        md5(coalesce(col("__idstr"), lit(""))).as("ids_md5"))
  }

  /** DuckDB oracle twin of [[encodeWith]] — generated from the same merge
    * constants (the [[encodeSqlD]] discipline), so a frozen trained table
    * is hash-checked against DuckDB exactly like the shipped one.
    */
  def encodeSqlWithD(ms: Seq[(String, String)]): String =
    s"""WITH syms AS (SELECT doc_id, ${toksD("text")} AS toks, ${symsWithD("text", ms)} AS ss FROM documents)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(ss) AS BIGINT) AS n_bpe_tokens,
       |  md5(array_to_string(list_transform(ss, sy -> (${idOfD("sy", ms)})::VARCHAR), ',')) AS ids_md5
       |FROM syms ORDER BY doc_id""".stripMargin
  // ------------------------------------------------------- byte fallback

  /** BYTE-FALLBACK encoding — the GPT-2 byte-level convention reduced to
    * this engine's symbol machinery: a word's atoms are its UTF-8 BYTES,
    * not its code points, so the base alphabet is BOUNDED at 256 ids
    * however exotic the input (the property production tokenizers ship
    * byte fallback for — the embedding table cannot grow with Unicode).
    * Each byte rides as a CARRIER CHARACTER so the existing per-word
    * merge chain applies unchanged: printable ASCII bytes (0x21–0x7E)
    * keep their own code point — the shipped and trained merge tables,
    * whose symbols are ASCII letters, operate identically on carrier
    * strings — and every other byte b maps injectively to U+0100+b (the
    * GPT-2 byte-encoder idea with a simpler rule; carrier code points
    * stay in U+0021–U+01FF, printable and surrogate-free). Ids: a single
    * carrier char is its BYTE VALUE (0–255); compounds keep VOCAB_BASE +
    * rank. Decode inverts exactly — ids → carrier string → bytes → one
    * UTF-8 decode — so the round trip is byte-exact for any valid UTF-8
    * input, including multi-byte scripts and supplementary-plane emoji
    * the code-point model covers only with unbounded ids. On printable
    * pure-ASCII text the two models emit IDENTICAL id streams
    * (spec-asserted), so the fallback is a strict extension.
    */
  private def byteWordS(w: String): String =
    s"""element_at(transform(array(hex(encode($w, 'UTF-8'))), hx0 ->
       |  IF(length(hx0) < 2, '',
       |    concat_ws('', transform(sequence(1, length(hx0) DIV 2), bi ->
       |      element_at(transform(array(cast(conv(substr(hx0, 2*bi - 1, 2), 16, 10) as int)),
       |        b0 -> format_string('%c', IF(b0 BETWEEN 33 AND 126, b0, b0 + 256))), 1))))), 1)"""
      .stripMargin.replace("\n", " ")
  private def byteWordD(w: String): String =
    s"""list_transform([hex(encode($w))], hx0 ->
       |  CASE WHEN length(hx0) < 2 THEN '' ELSE
       |    array_to_string(list_transform(generate_series(1, length(hx0) // 2), bi ->
       |      list_transform([('0x' || substr(hx0, 2*bi - 1, 2))::INT],
       |        b0 -> chr(CASE WHEN b0 BETWEEN 33 AND 126 THEN b0 ELSE b0 + 256 END))[1]), '')
       |  END)[1]"""
      .stripMargin.replace("\n", " ")

  /** Id of one byte-model symbol: carrier char → its byte value,
    * compound → VOCAB_BASE + rank (unknown compounds → -1, the
    * [[idOfS]] convention).
    */
  private def byteIdOfS(sy: String, ms: Seq[(String, String)]): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN '${lit1(s)}' THEN $id" }.mkString(" ")
    s"CASE WHEN length($sy) = 1 THEN " +
      s"IF(ascii($sy) >= 256, ascii($sy) - 256, ascii($sy)) " +
      s"ELSE CASE $sy $compounds ELSE -1 END END"
  }
  private def byteIdOfD(sy: String, ms: Seq[(String, String)]): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN '${lit1D(s)}' THEN $id" }.mkString(" ")
    s"CASE WHEN len($sy) = 1 THEN " +
      s"CASE WHEN ascii($sy) >= 256 THEN ascii($sy) - 256 ELSE ascii($sy) END " +
      s"ELSE CASE $sy $compounds ELSE -1 END END"
  }

  /** Byte-model symbol of one id — carrier char below 256, compound
    * string for known compound ids, NULL otherwise (the [[symOfS]]
    * hostile-id contract; carrier code points never reach the surrogate
    * block by construction, but negatives and unknown ids still fall
    * through to NULL before any formatter runs).
    */
  private def byteSymOfS(idv: String, ms: Seq[(String, String)]): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN $id THEN '${lit1(s)}'" }.mkString(" ")
    s"CASE WHEN $idv >= 0 AND $idv < 256 THEN " +
      s"format_string('%c', IF($idv BETWEEN 33 AND 126, cast($idv as int), cast($idv as int) + 256)) " +
      s"ELSE CASE $idv $compounds ELSE NULL END END"
  }
  private def byteSymOfD(idv: String, ms: Seq[(String, String)]): String = {
    val compounds = vocabIdsOf(ms).toSeq.sortBy(_._2)
      .map { case (s, id) => s"WHEN $id THEN '${lit1D(s)}'" }.mkString(" ")
    s"CASE WHEN $idv >= 0 AND $idv < 256 THEN " +
      s"chr(CASE WHEN $idv BETWEEN 33 AND 126 THEN ($idv)::INT ELSE ($idv)::INT + 256 END) " +
      s"ELSE CASE $idv $compounds ELSE NULL END END"
  }

  /** Carrier string → original word: each carrier char back to its byte,
    * the byte string through ONE UTF-8 decode.
    */
  private def byteDecodeWordS(m: String): String =
    s"""element_at(transform(array($m), m0 ->
       |  IF(length(m0) < 1, '',
       |    decode(unhex(concat_ws('', transform(sequence(1, length(m0)), ci ->
       |      element_at(transform(array(ascii(substr(m0, ci, 1))), cp0 ->
       |        lpad(hex(IF(cp0 >= 256, cp0 - 256, cp0)), 2, '0')), 1)))), 'UTF-8'))), 1)"""
      .stripMargin.replace("\n", " ")
  private def byteDecodeWordD(m: String): String =
    s"""list_transform([$m], m0 ->
       |  CASE WHEN length(m0) < 1 THEN '' ELSE
       |    decode(from_hex(array_to_string(list_transform(generate_series(1, length(m0)), ci ->
       |      list_transform([ascii(m0[ci])], cp0 ->
       |        lpad(hex(CASE WHEN cp0 >= 256 THEN cp0 - 256 ELSE cp0 END), 2, '0'))[1]), '')))
       |  END)[1]"""
      .stripMargin.replace("\n", " ")

  /** Per-document byte-fallback encode→decode round trip on the
    * DICTIONARY PATH (the [[decodeRoundTrip]] shape: byte mapping, merge
    * chain, id table, and decode all run once per DISTINCT word, fan
    * back by position, reassemble per doc). Output per document:
    * (idCol, n_bpe_tokens, decoded_md5, roundtrip_ok, max_base_id) —
    * n_bpe_tokens counts the spaced stream (marker id 32 = the space
    * byte, between words), and max_base_id ≤ 255 is the BOUNDED-alphabet
    * witness the byte model exists for (the code-point model emits ids
    * up to 0x10FFFF on the same input).
    */
  def byteRoundTrip(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      ms: Seq[(String, String)] = merges): DataFrame = {
    validate(ms)
    val base = docs.select(col(idCol), expr(toksS(textCol)).as("__toks"))
    val words = base.select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "__w")))
    val decFromIds = byteDecodeWordS(
      s"concat_ws('', transform(idv, v0 -> ${byteSymOfS("v0", ms)}))")
    def entry(w: String) =
      s"""element_at(transform(array(${byteWordS(w)}), bw ->
         |  element_at(transform(array(${wordSymsS("bw", ms)}), ws ->
         |    element_at(transform(array(transform(ws, sy -> ${byteIdOfS("sy", ms)})), idv ->
         |      named_struct(
         |        '__n', cast(size(ws) as bigint),
         |        '__maxb', coalesce(array_max(filter(idv, v1 -> v1 < ${VOCAB_BASE}L)), -1L),
         |        '__d', $decFromIds)), 1)), 1)), 1)"""
        .stripMargin.replace("\n", " ")
    val perDoc = dictFanBack(words, entry, "__e")
      .select(col(idCol), col("__p"), col("__e.__n").as("__n"),
        col("__e.__maxb").as("__maxb"), col("__e.__d").as("__d"))
      .groupBy(idCol)
      .agg(
        expr("sum(__n) + count(1) - 1").as("n_bpe_tokens"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(__p, __d))), x -> x.__d))")
          .as("__dd"),
        max(col("__maxb")).as("max_base_id"))
    base.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        md5(coalesce(col("__dd"), lit(""))).as("decoded_md5"),
        (coalesce(col("__dd"), lit("")) === concat_ws(" ", col("__toks")))
          .as("roundtrip_ok"),
        coalesce(col("max_base_id"), lit(-1L)).as("max_base_id"))
  }

  /** DuckDB oracle twin of [[byteRoundTrip]] over a CTE `aug(doc_id,
    * text)` — per-word scan form (the oracle verifies VALUES, not the
    * dictionary plan). Yields CTEs ending in `bf(doc_id, n_bpe_tokens,
    * decoded_md5, roundtrip_ok, max_base_id)`.
    */
  def byteRoundTripSqlD(ms: Seq[(String, String)] = merges): String = {
    val decFromIds = byteDecodeWordD(
      s"array_to_string(list_transform(idv, v0 -> ${byteSymOfD("v0", ms)}), '')")
    s"""tk AS (SELECT doc_id, ${toksD("text")} AS toks FROM aug),
       |wd AS (SELECT doc_id, i AS pos, toks[i] AS w
       |       FROM tk, unnest(generate_series(1, len(toks))) AS g(i)),
       |wrow AS (SELECT doc_id, pos,
       |    list_transform([${byteWordD("w")}], bw ->
       |      list_transform([${wordSymsD("bw", ms)}], ws0 ->
       |        list_transform([list_transform(ws0, sy -> ${byteIdOfD("sy", ms)})], idv ->
       |          {'n': len(ws0),
       |           'maxb': coalesce(list_max(list_filter(idv, v1 -> v1 < $VOCAB_BASE)), -1),
       |           'd': $decFromIds})[1])[1])[1] AS r
       |  FROM wd),
       |agg AS (SELECT doc_id,
       |    CAST(sum(r.n) + count(*) - 1 AS BIGINT) AS n_bpe_tokens,
       |    string_agg(r.d, ' ' ORDER BY pos) AS dd,
       |    CAST(max(r.maxb) AS BIGINT) AS max_base_id
       |  FROM wrow GROUP BY doc_id),
       |bf AS (SELECT tk.doc_id,
       |    COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
       |    md5(COALESCE(agg.dd, '')) AS decoded_md5,
       |    COALESCE(agg.dd, '') = array_to_string(tk.toks, ' ') AS roundtrip_ok,
       |    COALESCE(agg.max_base_id, -1) AS max_base_id
       |  FROM tk LEFT JOIN agg USING (doc_id))""".stripMargin
  }

}
