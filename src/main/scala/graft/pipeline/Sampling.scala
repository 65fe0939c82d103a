package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixture construction.
  *
  * A pretraining pipeline rarely trains on the raw corpus mix: it
  * downsamples over-represented strata (language, source, quality bucket)
  * to target rates. At 100 TB the sampling decision must be
  *  - scan-side (a per-row predicate, no shuffle),
  *  - deterministic and seedless (re-runs and retried tasks pick the SAME
  *    rows — `rand()` resamples per retry and poisons exactly-once sinks),
  *  - rate-driven by a small table (the mixture config), not code.
  *
  * The keep decision hashes the document id through a multiplicative
  * integer hash onto [0, 1e6) and keeps rows whose bucket falls below the
  * stratum's rate_ppm — integer arithmetic end to end, so the oracle
  * computes the identical sample.
  */
object Sampling {

  /** Largest |id| for which id * 2654435761 + 40503 stays inside a Long.
    * Ids past this would silently wrap in non-ANSI mode and bias the
    * keep/drop decision, so [[bucketPpm]] errors in-plan instead (the
    * lineDedup convention — fail fast, never silently wrong).
    */
  val MaxIdMagnitude: Long = (Long.MaxValue - 40503L) / 2654435761L

  /** Multiplicative hash of the id column onto [0, 1_000_000) — Knuth's
    * 2654435761 with an odd offset so id 0 is not pinned to bucket 0.
    * Errors in-plan for |id| > [[MaxIdMagnitude]] (~3.47e9); callers with
    * wider ids remap first. Symmetric compare, no abs() — abs(Long.Min)
    * wraps negative in non-ANSI mode and would evade an abs-based check.
    */
  def bucketPpm(idCol: String): org.apache.spark.sql.Column =
    expr(
      s"""abs(if(`$idCol` > ${MaxIdMagnitude}L or `$idCol` < -${MaxIdMagnitude}L,
         |  cast(raise_error(concat('bucketPpm: |$idCol| exceeds $MaxIdMagnitude - the sampling hash would overflow; remap ids first (got ',
         |    cast(`$idCol` as string), ')')) as bigint),
         |  `$idCol` * 2654435761L + 40503L) % 1000000L)""".stripMargin)

  /** Keep each row of `docs` when hash(id) < rate_ppm of its stratum.
    *
    * @param rates      (stratum, rate_ppm) table — joined BROADCAST so the
    *                   mixture config never shuffles the corpus
    * @param defaultPpm rate for strata absent from `rates` (1e6 keeps all)
    */
  def stratifiedByRate(
      docs: DataFrame,
      stratumCol: String,
      rates: DataFrame,
      defaultPpm: Long = 1000000L,
      idCol: String = "doc_id"): DataFrame = {
    require(rates.columns.toSeq == Seq(stratumCol, "rate_ppm"),
      s"rates must have columns ($stratumCol, rate_ppm), got ${rates.columns.mkString(", ")}")
    val reserved = Seq("rate_ppm", "__bucket", "bucket_ppm").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with internal names (rename them): ${reserved.mkString(", ")}")
    val guarded = dupGuardedRates(rates, stratumCol, "stratifiedByRate")
    applyRates(docs, stratumCol, guarded, defaultPpm, idCol)
  }

  /** A duplicated stratum key would silently MULTIPLY corpus rows through
    * the rates join instead of sampling them. Guard at the cheapest point
    * that still can't be skipped: the usual mixture config is a literal
    * local table, validated driver-side for free (no job — an eager
    * collect here measured +60% on a scan-side operator); anything
    * non-local gets an IN-PLAN flag instead — one global aggregate over
    * the tiny rates table (SinglePartition exchange, never a hash
    * shuffle, so scan-side plan guards hold) cross-joined back as a
    * 1-row broadcast, raising on execution.
    */
  private def dupGuardedRates(
      rates: DataFrame,
      stratumCol: String,
      opName: String): DataFrame =
    rates.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val i = lr.output.indexWhere(_.name == stratumCol)
        val keys = lr.data.map(_.get(i, lr.output(i).dataType))
        require(keys.distinct.size == keys.size,
          s"$opName: duplicate rates rows - one rate_ppm per stratum required")
        rates
      case _ =>
        val dupFlag = rates.agg(count(lit(1)).as("__n"),
          size(collect_set(col(stratumCol))).cast("long").as("__d"))
        rates.crossJoin(broadcast(dupFlag))
          .withColumn("rate_ppm", when(col("__n") =!= col("__d"),
              expr(s"cast(raise_error('$opName: duplicate rates rows - one rate_ppm per stratum required') as bigint)"))
            .otherwise(col("rate_ppm")))
          .drop("__n", "__d")
    }

  /** The sampling core: broadcast-join the rates, keep rows whose hash
    * bucket falls under the stratum's rate. Callers are responsible for
    * rates uniqueness ([[stratifiedByRate]] guards; [[mixtureByBudget]]'s
    * rates are a groupBy output — unique structurally).
    */
  private def applyRates(
      docs: DataFrame,
      stratumCol: String,
      rates: DataFrame,
      defaultPpm: Long,
      idCol: String): DataFrame =
    docs
      .join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("__bucket", bucketPpm(idCol))
      .where(col("__bucket") < coalesce(col("rate_ppm"), lit(defaultPpm)))
      .drop("rate_ppm")
      .withColumnRenamed("__bucket", "bucket_ppm")

  /** Per-stratum keep rates derived from TOKEN BUDGETS: rate_ppm =
    * min(1e6, budget_tokens * 1e6 / stratum_total_tokens), exact integer
    * arithmetic. This is how a mixture config is actually written — "this
    * run gets N tokens of code, M of books" — with the translation to
    * rates done by the engine, not a notebook. Only budgeted strata get a
    * row; unlisted strata fall to the sampler's `defaultPpm`.
    *
    * One aggregation pass over `docs` (map-side partial sums, output rows
    * = #strata) joined to the literal budget table. A stratum whose total
    * is 0 tokens keeps everything (its budget constrains nothing).
    */
  def mixtureRates(
      docs: DataFrame,
      stratumCol: String,
      budgets: Map[String, Long],
      tokensCol: String): DataFrame = {
    require(budgets.nonEmpty, "mixtureRates: budgets must be non-empty")
    // budget * 1e6 must stay inside a Long; budgets is a literal map, so
    // the check is driver-side and free (no in-plan guard needed)
    val maxBudget = Long.MaxValue / 1000000L
    budgets.foreach { case (s, b) =>
      require(b >= 0 && b <= maxBudget,
        s"mixtureRates: budget for '$s' must be in [0, $maxBudget] tokens, got $b")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs.groupBy(stratumCol).agg(sum(col(tokensCol)).as("__tot"))
    totals
      .join(broadcast(budgets.toSeq.toDF(stratumCol, "__budget")), stratumCol)
      .select(col(stratumCol),
        when(col("__tot") <= 0, lit(1000000L))
          .otherwise(least(lit(1000000L), expr("__budget * 1000000L div __tot")))
          .as("rate_ppm"))
  }

  /** Exact-COUNT stratified sampling: exactly min(n, |stratum|) rows per
    * stratum (mixture configs are often written "exactly N docs of
    * source X", not as rates). Selection is the deterministic hash order
    * ([[bucketPpm]], ties on id) — seedless, so retries and re-runs pick
    * the identical sample, and the chosen rows are a PREFIX of the
    * rate-sampled ordering (growing n only adds rows). The config IS the
    * mixture: strata absent from `counts` are dropped (n defaults to 0) —
    * a passthrough stratum would defeat the literal rank pre-filter the
    * scale story depends on, so callers wanting one must name it with an
    * explicit (large) n and accept the weaker pruning.
    *
    * Scale shape: the rank window partitions by stratum, which would
    * serialize a 100 TB stratum — except the literal `__rn <=
    * max(counts)` pre-filter lets Spark push a WindowGroupLimit below the
    * exchange (plan-asserted, the qi_topk mechanism): every map task
    * keeps at most max(n) rows per stratum BEFORE the shuffle, so the
    * per-stratum partition ranks over at most n × #tasks rows — bounded
    * by the config, never by the corpus. The exact per-stratum cap then
    * applies on the pruned stream.
    */
  def exactPerStratum(
      docs: DataFrame,
      stratumCol: String,
      counts: Map[String, Long],
      idCol: String = "doc_id"): DataFrame = {
    require(counts.nonEmpty, "exactPerStratum: counts must be non-empty")
    counts.foreach { case (s, n) =>
      require(n >= 0, s"exactPerStratum: count for '$s' must be >= 0, got $n")
    }
    require(!docs.columns.contains("sample_rank"),
      "docs columns collide with internal names (rename them): sample_rank")
    val maxN = counts.values.max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(bucketPpm(idCol), col(idCol))
    docs
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= maxN) // literal: triggers WindowGroupLimit
      .where(col("sample_rank") <=
        coalesce(element_at(typedLit(counts), col(stratumCol)), lit(0L)))
  }

  /** Deterministic holdout split: label every row train/val/test (any
    * number of named slices) by its [[bucketPpm]] bucket against the
    * cumulative ppm boundaries. Pure scan-side projection — no shuffle,
    * no sampling job — and the same row lands in the same slice on every
    * run, on task retry, AND as the corpus grows (membership depends only
    * on the row's id, so an incremental ingest never migrates old docs
    * between train and eval — the leak a fraction-based split re-rolls
    * every snapshot).
    */
  def holdoutSplit(
      docs: DataFrame,
      splits: Seq[(String, Long)],
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "holdoutSplit: splits must be non-empty")
    require(splits.map(_._1).distinct.size == splits.size,
      s"holdoutSplit: split names must be unique, got ${splits.map(_._1).mkString(", ")}")
    require(splits.forall(_._2 > 0),
      s"holdoutSplit: every slice needs a positive ppm share, got ${splits.mkString(", ")}")
    require(splits.map(_._2).sum == 1000000L,
      s"holdoutSplit: ppm shares must sum to exactly 1000000, got ${splits.map(_._2).sum}")
    require(!docs.columns.contains("split") && !docs.columns.contains("bucket_ppm"),
      "docs columns collide with internal names (rename them): split, bucket_ppm")
    val bounds = splits.scanLeft(0L)(_ + _._2).tail
    val label = splits.zip(bounds).tail.foldLeft(
      when(col("bucket_ppm") < bounds.head, lit(splits.head._1))) {
      case (acc, ((name, _), hi)) => acc.when(col("bucket_ppm") < hi, lit(name))
    }
    docs
      .withColumn("bucket_ppm", bucketPpm(idCol))
      .withColumn("split", label)
  }

  /** [[mixtureRates]] WITHOUT the 1e6 cap: a budget larger than its
    * stratum yields rate_ppm > 1e6, meaning the stratum must be REPEATED
    * (multi-epoch upsampling — how real mixtures treat small high-quality
    * sources). Pair with [[stratifiedWithRepeats]]. `maxEpochs` bounds the
    * derived rate in-plan (raise_error): a near-empty stratum under a big
    * budget would otherwise explode each row into millions of copies —
    * fail fast, never silently fan out.
    */
  def mixtureEpochRates(
      docs: DataFrame,
      stratumCol: String,
      budgets: Map[String, Long],
      tokensCol: String,
      maxEpochs: Long = 100L): DataFrame = {
    require(budgets.nonEmpty, "mixtureEpochRates: budgets must be non-empty")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val maxBudget = Long.MaxValue / 1000000L
    budgets.foreach { case (s, b) =>
      require(b >= 0 && b <= maxBudget,
        s"mixtureEpochRates: budget for '$s' must be in [0, $maxBudget] tokens, got $b")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs.groupBy(stratumCol).agg(sum(col(tokensCol)).as("__tot"))
    totals
      .join(broadcast(budgets.toSeq.toDF(stratumCol, "__budget")), stratumCol)
      .select(col(stratumCol),
        when(col("__tot") <= 0, lit(1000000L))
          .otherwise(expr(
            s"""if(__budget * 1000000L div __tot > ${maxEpochs}L * 1000000L,
               |  cast(raise_error(concat('mixtureEpochRates: derived rate for stratum ', cast($stratumCol as string),
               |    ' exceeds $maxEpochs epochs - a near-empty stratum under this budget would fan out explosively; raise maxEpochs deliberately or fix the budget')) as bigint),
               |  __budget * 1000000L div __tot)""".stripMargin))
          .as("rate_ppm"))
  }

  /** Rate-driven sampling with UPSAMPLING: `rate_ppm` may exceed 1e6.
    * Every row emits `rate div 1e6` copies, plus one more when its hash
    * bucket falls under `rate mod 1e6` — so a stratum at rate 2.3e6
    * averages 2.3 copies of itself, deterministically (the same rows get
    * the extra copy on every run, and a rate <= 1e6 degenerates to
    * exactly [[stratifiedByRate]]'s selection). The emitted `epoch`
    * column numbers the copies 0..k-1 so downstream packing/shuffling can
    * spread repeats apart.
    *
    * Scan-side: broadcast rates join + an explode of a per-row sequence —
    * the corpus never shuffles, and the fan-out is exactly the mixture's
    * token multiple (bounded upstream by [[mixtureEpochRates]]'s
    * maxEpochs guard).
    */
  def stratifiedWithRepeats(
      docs: DataFrame,
      stratumCol: String,
      rates: DataFrame,
      defaultPpm: Long = 1000000L,
      idCol: String = "doc_id"): DataFrame = {
    require(rates.columns.toSeq == Seq(stratumCol, "rate_ppm"),
      s"rates must have columns ($stratumCol, rate_ppm), got ${rates.columns.mkString(", ")}")
    applyRepeats(docs, stratumCol,
      dupGuardedRates(rates, stratumCol, "stratifiedWithRepeats"), defaultPpm, idCol)
  }

  /** [[mixtureEpochRates]] composed with the repeat sampler — the
    * budget-written multi-epoch mixture. Like [[mixtureByBudget]], the
    * dup guard is skipped deliberately: the rates are a groupBy output
    * (unique structurally), and the in-plan guard would re-derive the
    * whole rates pipeline — including a second corpus scan — just to
    * re-check it (the plan guard caught exactly this).
    */
  def mixtureByBudgetEpochs(
      docs: DataFrame,
      stratumCol: String,
      budgets: Map[String, Long],
      tokensCol: String,
      defaultPpm: Long = 1000000L,
      maxEpochs: Long = 100L,
      idCol: String = "doc_id"): DataFrame =
    applyRepeats(docs, stratumCol,
      mixtureEpochRates(docs, stratumCol, budgets, tokensCol, maxEpochs), defaultPpm, idCol)

  /** The repeat-sampling core (see [[stratifiedWithRepeats]] for the
    * contract; callers own rates uniqueness).
    */
  private def applyRepeats(
      docs: DataFrame,
      stratumCol: String,
      rates: DataFrame,
      defaultPpm: Long,
      idCol: String): DataFrame = {
    val reserved = Seq("rate_ppm", "__bucket", "__k", "bucket_ppm", "epoch")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with internal names (rename them): ${reserved.mkString(", ")}")
    docs
      .join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("__bucket", bucketPpm(idCol))
      .withColumn("rate_ppm", coalesce(col("rate_ppm"), lit(defaultPpm)))
      .withColumn("__k",
        expr("rate_ppm div 1000000L + if(__bucket < rate_ppm % 1000000L, 1L, 0L)"))
      .where(col("__k") > 0)
      .withColumn("epoch", explode(expr("sequence(0L, __k - 1L)")))
      .drop("rate_ppm", "__k")
      .withColumnRenamed("__bucket", "bucket_ppm")
  }

  /** Budget-driven mixture sampling: [[mixtureRates]] composed with
    * [[stratifiedByRate]]. Two passes over the corpus — the totals
    * aggregation and the scan-side keep predicate — which is inherent:
    * the rate depends on a global per-stratum sum. The rates table
    * (#strata rows) broadcasts; the corpus never shuffles.
    */
  def mixtureByBudget(
      docs: DataFrame,
      stratumCol: String,
      budgets: Map[String, Long],
      tokensCol: String,
      defaultPpm: Long = 1000000L,
      idCol: String = "doc_id"): DataFrame = {
    val reserved = Seq("rate_ppm", "__bucket", "bucket_ppm").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with internal names (rename them): ${reserved.mkString(", ")}")
    // rates come out of a groupBy on the stratum — unique by construction,
    // so the stratifiedByRate dup guard (which would re-aggregate the
    // corpus-derived rates a second time) is skipped deliberately
    applyRates(docs, stratumCol,
      mixtureRates(docs, stratumCol, budgets, tokensCol), defaultPpm, idCol)
  }

  /** Temperature-scaled mixture rates: per-stratum keep rates such that
    * the sampled token mass is split proportionally to `tot_i^alpha`
    * (alpha < 1 flattens the natural distribution — the standard
    * multilingual / multi-domain rebalancing rule: small strata get a
    * larger share than their raw frequency, dominant strata a smaller
    * one), under a single TOTAL token budget. Where [[mixtureRates]]
    * needs a hand-written budget per stratum, this derives the whole
    * split from one knob.
    *
    * Integer-exact and cross-engine deterministic for the default
    * alpha = 0.5: the stratum weight is `floor(sqrt(tot))` — IEEE-754
    * requires sqrt to be correctly rounded, so Spark and any replaying
    * engine (the DuckDB oracle) floor the SAME double. Other alphas go
    * through `pow`, which carries no such guarantee; same-engine runs
    * are still deterministic, but a cross-engine replay may differ in
    * the last ppm at weight-ratio boundaries (documented, not guarded).
    * After the weight, everything is Long arithmetic:
    * `w_ppm = w * 1e6 div S` (S = sum of weights), and
    * `rate_ppm = min(1e6, budget * w_ppm div tot)` — `budget * w_ppm`
    * cannot overflow because budget <= Long.Max/1e6 (required) and
    * w_ppm <= 1e6. The weight itself is guarded in-plan: a stratum with
    * `tot^alpha > Long.Max/1e6` would overflow the normalization, so
    * the plan raises with a lower-alpha hint instead of wrapping.
    *
    * Downsampling-only by design (rates cap at 1e6): a budget larger
    * than the corpus leaves all strata at keep-everything rather than
    * upsampling — compose [[mixtureByBudgetEpochs]] with hand weights
    * when repeats are wanted. Zero-token strata keep everything (the
    * budget constrains nothing), mirroring [[mixtureRates]].
    *
    * One aggregation pass over `docs` (output rows = #strata) plus a
    * single-row weight-sum broadcast — the corpus never shuffles.
    */
  def temperatureRates(
      docs: DataFrame,
      stratumCol: String,
      budget: Long,
      tokensCol: String,
      alpha: Double = 0.5): DataFrame = {
    val maxBudget = Long.MaxValue / 1000000L
    require(budget >= 0 && budget <= maxBudget,
      s"temperatureRates: budget must be in [0, $maxBudget] tokens, got $budget")
    require(alpha > 0 && alpha <= 1,
      s"temperatureRates: alpha must be in (0, 1], got $alpha")
    val wExpr =
      if (alpha == 0.5) "sqrt(cast(__tot as double))"
      else s"power(cast(__tot as double), ${alpha}d)"
    val totals = docs.groupBy(stratumCol).agg(sum(col(tokensCol)).as("__tot"))
    val weighted = totals.withColumn("__w", expr(
      s"""if(__tot <= 0, 0L,
         |  if($wExpr >= ${maxBudget}d,
         |    cast(raise_error(concat('temperatureRates: weight tot^alpha for stratum ',
         |      cast($stratumCol as string), ' overflows the ppm normalization; lower alpha')) as bigint),
         |    cast(floor($wExpr) as bigint)))""".stripMargin))
    // weight normalization via a window over the AGGREGATE OUTPUT — a
    // #strata-row frame, so the unpartitioned window is config-sized, and
    // the totals subtree (the one corpus scan) is not duplicated into a
    // second aggregate branch (a separate wSum agg + crossJoin re-derives
    // totals and scans the corpus twice)
    val wWin = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    weighted
      .withColumn("__s", sum(col("__w")).over(wWin))
      .select(col(stratumCol),
        when(col("__tot") <= 0, lit(1000000L))
          .otherwise(expr(
            s"least(1000000L, ${budget}L * (__w * 1000000L div __s) div __tot)"))
          .as("rate_ppm"))
  }

  /** [[temperatureRates]] composed with the scan-side rate sampler — the
    * one-knob domain-balanced mixture. Rates are a groupBy output (unique
    * structurally), so the dup guard is skipped as in [[mixtureByBudget]].
    * Every stratum present in docs gets a derived rate; `defaultPpm` only
    * applies to rows whose stratum is NULL (groupBy gives NULL its own
    * rate row, so in practice it never fires — kept for signature parity
    * with the other composers).
    */
  def mixtureByTemperature(
      docs: DataFrame,
      stratumCol: String,
      budget: Long,
      tokensCol: String,
      alpha: Double = 0.5,
      defaultPpm: Long = 1000000L,
      idCol: String = "doc_id"): DataFrame = {
    val reserved = Seq("rate_ppm", "__bucket", "bucket_ppm").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with internal names (rename them): ${reserved.mkString(", ")}")
    applyRates(docs, stratumCol,
      temperatureRates(docs, stratumCol, budget, tokensCol, alpha), defaultPpm, idCol)
  }

  /** Curriculum / quality binning: assign each document a 1..nBins bin by
    * its position in the SCORE distribution — the "train on the top
    * quality quartile at full rate, lower ones thinned" knob, composing
    * directly with [[stratifiedByRate]] on the bin column.
    *
    * Scale shape: a global `ntile` would sort the corpus in one
    * partition. Instead the distribution is captured as a score HISTOGRAM
    * (one map-side-combinable aggregate, output rows = score cardinality
    * — classifier scores are integer milli, so thousands, not corpus
    * rows), the cumulative below-count runs as a window over that
    * config-sized frame, and the bin assignment broadcasts back onto the
    * corpus scan: `bin = below * nBins div total + 1`. Equal scores land
    * in the SAME bin (the histogram cannot split a score across a
    * boundary) — bins are equal-count up to score-tie granularity, which
    * is also what makes the assignment deterministic and replayable.
    */
  def scoreBins(
      docs: DataFrame,
      scoreCol: String,
      nBins: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nBins >= 1 && nBins <= 10000,
      s"scoreBins: nBins must be in [1, 10000], got $nBins")
    val missing = Seq(idCol, scoreCol).filterNot(docs.columns.contains)
    require(missing.isEmpty, s"columns absent from docs: ${missing.mkString(", ")}")
    val reserved = Seq("bin", "__n", "__below", "__total").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")
    val hist = docs.groupBy(col(scoreCol)).agg(count(lit(1)).as("__n"))
    // both windows run over the HISTOGRAM frame (score-cardinality rows) —
    // the single-partition warning they carry is about a config-sized
    // frame, never the corpus
    val wBelow = org.apache.spark.sql.expressions.Window.orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val bins = hist
      .withColumn("__below", coalesce(sum(col("__n")).over(wBelow), lit(0L)))
      .withColumn("__total", sum(col("__n")).over(wAll))
      .select(col(scoreCol),
        expr(s"least(${nBins}L, __below * ${nBins}L div __total + 1L)").as("bin"))
    docs.join(broadcast(bins), Seq(scoreCol))
  }

  /** EXACT per-stratum token-budget prefix: keep each stratum's documents
    * in the deterministic hash order ([[bucketPpm]], ties on id) while the
    * running token total stays <= the stratum's cap. This is the exact
    * counterpart of [[mixtureRates]]' expected-value rates — "at most N
    * tokens of source X, and the SAME rows every run" — and the
    * token-denominated sibling of [[exactPerStratum]]'s row counts.
    * Strata absent from `caps` are dropped (the config IS the mixture,
    * the [[exactPerStratum]] convention).
    *
    * Scale shape: a naive running-sum window serializes each stratum —
    * unusable when one stratum is half the corpus. The window therefore
    * runs on a PREFILTERED superset: a scan-side bucket cutoff at
    * `marginPct`% of the proportional rate `cap/tot` keeps ~margin x cap
    * tokens per stratum, and the sequential pass orders ~margin x cap
    * tokens, bounded by the CONFIG, not the corpus. The prefilter is
    * provably safe or loud: survivors are a prefix of the stratum's hash
    * order, so if their token total STRICTLY exceeds the cap the true
    * budget prefix lies entirely inside them — and an in-plan guard
    * raises when it doesn't (pathological token-mass skew across hash
    * buckets). The guard is a zero-row UNION branch derived from the
    * per-stratum aggregates, NOT a per-row predicate: it fires even when
    * the prefilter leaves a stratum with no survivor rows at all (a
    * per-row raise would have nothing to evaluate on and truncate
    * silently). Raise `marginPct` if it fires.
    *
    * @return docs columns + `n_tok` (guarded count), `cum_tok` (running
    *         total, inclusive), `bucket_ppm`
    */
  def tokenCapPerStratum(
      docs: DataFrame,
      stratumCol: String,
      caps: Map[String, Long],
      tokensCol: String,
      idCol: String = "doc_id",
      marginPct: Long = 300L): DataFrame = {
    require(caps.nonEmpty, "tokenCapPerStratum: caps must be non-empty")
    val maxCap = Long.MaxValue / 1000000L
    caps.foreach { case (s, c) =>
      require(c >= 0 && c <= maxCap,
        s"tokenCapPerStratum: cap for '$s' must be in [0, $maxCap] tokens, got $c")
    }
    require(marginPct >= 100 && marginPct <= 100000,
      s"tokenCapPerStratum: marginPct must be in [100, 100000], got $marginPct")
    val reserved = Seq("__cap", "__tot", "__cut", "__bucket", "__stot",
      "n_tok", "cum_tok", "bucket_ppm").filter(c =>
        docs.columns.contains(c) && c != tokensCol)
    require(reserved.isEmpty,
      s"docs columns collide with output/internal names (rename them): ${reserved.mkString(", ")}")

    val spark = docs.sparkSession
    import spark.implicits._
    val capDf = caps.toSeq.toDF(stratumCol, "__cap")
    val nTok = expr(
      s"""if(`$tokensCol` is null or `$tokensCol` < 0,
         |  cast(raise_error(concat('tokenCapPerStratum: $tokensCol must be a non-negative integer, got ',
         |    coalesce(cast(`$tokensCol` as string), 'NULL'))) as bigint),
         |  cast(`$tokensCol` as bigint))""".stripMargin)
    // bucket cutoff: full keep when the cap covers the stratum; otherwise
    // marginPct% of the proportional rate (base < 1e6 on that arm, so the
    // margin product stays far from Long range)
    val cutExpr =
      s"""if(__cap * 1000000L div greatest(__tot, 1L) >= 1000000L, 1000000L,
         |  least(1000000L, (__cap * 1000000L div greatest(__tot, 1L)) * ${marginPct}L div 100L))"""
        .stripMargin
    // inner join: unlisted strata are dropped BEFORE the corpus-wide
    // aggregate and window ever see them
    val capped = docs.join(broadcast(capDf), Seq(stratumCol))
      .withColumn("n_tok", nTok)
    // __cap is functionally dependent on the stratum (a literal map), so
    // grouping by both keeps it available without a first() aggregate
    val totals = capped.groupBy(col(stratumCol), col("__cap"))
      .agg(sum(col("n_tok")).as("__tot"))
      .select(col(stratumCol), col("__tot"), col("__cap"))
    val survivors = capped
      .join(broadcast(totals.select(col(stratumCol), col("__tot"))), Seq(stratumCol))
      .withColumn("__cut", expr(cutExpr))
      .withColumn("__bucket", bucketPpm(idCol))
      .where(col("__bucket") < col("__cut"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col("__bucket"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val kept = survivors
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") <= col("__cap"))
      .drop("__cap", "__tot", "__cut")
      .withColumnRenamed("__bucket", "bucket_ppm")
    // zero-row guard branch: per-stratum survivor totals vs cap, computed
    // from aggregates alone — raises on margin failure even for strata the
    // prefilter emptied entirely. `__stot` is null for such strata (left
    // join), which coalesces to 0 and correctly trips the strict > cap
    // requirement.
    val survTot = survivors.groupBy(stratumCol).agg(sum(col("n_tok")).as("__stot"))
    // ONE conditional expression, not two stacked filters: Spark merges
    // consecutive Filters and may evaluate the conjuncts in either order,
    // so a bare raise_error predicate behind a separate condition filter
    // fires spuriously on valid strata
    val invalid = totals
      .withColumn("__cut", expr(cutExpr))
      .join(survTot, Seq(stratumCol), "left")
      .where(expr(
        s"""if(__cut < 1000000L and coalesce(__stot, 0L) <= __cap,
           |  cast(raise_error(concat('tokenCapPerStratum: prefilter margin too small for stratum ',
           |    cast($stratumCol as string), ' - raise marginPct')) as boolean),
           |  false)""".stripMargin))
    val guardRows = kept.schema.fields.foldLeft(invalid.select()) {
      case (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    kept.unionByName(guardRows)
  }

  /** CALIBRATED per-stratum score cutoffs — apply ONE keep-rate across
    * heterogeneous sources: a fixed global score threshold keeps 90% of a
    * clean curated dump and 4% of a noisy crawl (the score scales are not
    * comparable), so production filters calibrate per stratum — "keep the
    * top `keepPpm` of EACH source by ITS OWN score distribution".
    *
    * cutoff(stratum) = the target-th highest score, target = floor(n ×
    * keepPpm / 1e6); keeping `score >= cutoff` includes boundary TIES
    * (deterministic overshoot, the curriculum-bin convention — equal
    * scores never split). Strata whose target floors to 0 emit no cutoff
    * row: nothing keeps.
    *
    * Scale shape (the curriculum histogram trick, per stratum): the
    * distribution is captured as a (stratum, score) COUNT histogram —
    * map-side combinable, output sized by score cardinality (integer
    * scores: thousands of rows), NEVER a corpus-wide rank window — the
    * cumulative runs over that config-sized frame, and the cutoff table
    * broadcasts back onto the corpus scan.
    */
  def calibratedCutoffs(
      scored: DataFrame,
      stratumCol: String,
      scoreCol: String,
      keepPpm: Long): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L,
      s"calibratedCutoffs: keepPpm must be in [0, 1e6], got $keepPpm")
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col(stratumCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val desc = Window.partitionBy(stratumCol).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("__cum", sum(col("__c")).over(desc))
      .withColumn("__target", expr(s"(sum(__c) over (partition by `$stratumCol`)) * $keepPpm DIV 1000000"))
      .where(col("__cum") >= col("__target") && col("__target") > 0)
      .groupBy(stratumCol).agg(max(col(scoreCol)).as("cutoff"))
  }

  /** [[calibratedCutoffs]] applied back: every row labeled with its
    * stratum's cutoff and the keep verdict (`kept = score >= cutoff`;
    * false when the stratum has no cutoff). The cutoff table broadcasts —
    * the corpus never shuffles for the calibration.
    */
  def calibratedKeep(
      scored: DataFrame,
      stratumCol: String,
      scoreCol: String,
      keepPpm: Long,
      idCol: String = "doc_id"): DataFrame =
    calibratedKeepWith(scored,
      calibratedCutoffs(scored, stratumCol, scoreCol, keepPpm),
      stratumCol, scoreCol, idCol)

  /** Apply an EXPLICIT cutoff table — the streaming face: cutoffs derive
    * from a batch histogram pass over yesterday's corpus (or a rolling
    * snapshot) and apply to the live stream as a stream-static broadcast
    * join + scan-side compare — stateless, no watermark, replay-stable.
    * The batch form above is this function fed its own corpus's cutoffs.
    */
  def calibratedKeepWith(
      scored: DataFrame,
      cutoffs: DataFrame,
      stratumCol: String,
      scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(cutoffs.columns.contains("cutoff"),
      s"cutoffs must carry 'cutoff' (a calibratedCutoffs result), got ${cutoffs.columns.mkString(", ")}")
    scored.join(broadcast(cutoffs), Seq(stratumCol), "left")
      .select(col(idCol), col(stratumCol), col(scoreCol), col("cutoff"),
        // coalesce: a NULL score would make the compare NULL (not false),
        // and a NULL verdict is dropped by BOTH where(kept) and
        // where(!kept) — the contract is a boolean verdict for every row,
        // so unscorable rows land kept=false like unknown strata do
        coalesce(col("cutoff").isNotNull && col(scoreCol) >= col("cutoff"),
          lit(false)).as("kept"))
  }

  /** Upper median per stratum via the (stratum, value) HISTOGRAM — the
    * [[calibratedCutoffs]] plan shape with target = ceil(n/2), so a
    * single-row stratum reports its own value (the keep-rate form's
    * `target > 0` guard would drop it). Never a corpus rank window.
    */
  private def upperMedianPerStratum(
      df: DataFrame,
      stratumCol: String,
      valCol: String,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(stratumCol), col(valCol)).agg(count(lit(1)).as("__c"))
    val desc = Window.partitionBy(stratumCol).orderBy(col(valCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("__cum", sum(col("__c")).over(desc))
      .withColumn("__target",
        expr(s"((sum(__c) over (partition by `$stratumCol`)) + 1) DIV 2"))
      .where(col("__cum") >= col("__target"))
      .groupBy(stratumCol).agg(max(col(valCol)).as(outCol))
  }

  /** ROBUST per-stratum OUTLIER detection — median/MAD, the screen that
    * survives exactly the contamination it hunts: mean/stddev thresholds
    * move with the outliers they are supposed to catch (one badly mangled
    * shard shifts the mean and hides itself), while the median and the
    * median absolute deviation have a 50% breakdown point. A document is
    * flagged when |score − median| × 1000 > kMilli × MAD — all integer
    * arithmetic, so both engines agree exactly. A zero-MAD stratum (over
    * half its scores identical) flags ANY deviation — the strict reading
    * of robustness, documented rather than softened.
    *
    * Scale shape: two histogram passes ([[calibratedCutoffs]]'s shape —
    * per-stratum aggregates, never a corpus rank window), both broadcast
    * back; the corpus is scanned twice and never shuffled on its rows.
    * Output: (idCol, stratumCol, scoreCol, med, mad, is_outlier).
    */
  def madOutliers(
      scored: DataFrame,
      stratumCol: String,
      scoreCol: String,
      kMilli: Long = 3000L,
      idCol: String = "doc_id"): DataFrame = {
    require(kMilli > 0, s"madOutliers: kMilli must be positive, got $kMilli")
    val med = upperMedianPerStratum(scored, stratumCol, scoreCol, "med")
    val dev = scored.join(broadcast(med), Seq(stratumCol))
      .withColumn("__dev", abs(col(scoreCol) - col("med")))
    val mad = upperMedianPerStratum(
      dev.select(col(stratumCol), col("__dev")), stratumCol, "__dev", "mad")
    dev.join(broadcast(mad), Seq(stratumCol))
      .select(col(idCol), col(stratumCol), col(scoreCol), col("med"), col("mad"),
        (col("__dev") * 1000L > lit(kMilli) * col("mad")).as("is_outlier"))
  }

  /** DSIR-style IMPORTANCE WEIGHTS for data selection (cited technique:
    * Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023 — hashed-n-gram importance weights;
    * original implementation, reduced to this engine's integer-exact
    * discipline): each raw document is scored by how much more likely its
    * bigram stream is under a TARGET-corpus language model than under the
    * RAW-corpus model,
    *
    *   weight(doc) = Σ_bigrams [log2 p_target(c|p) − log2 p_raw(c|p)],
    *
    * with both conditionals estimated by LAPLACE-smoothed count ratios,
    * p(c|p) = (bc + 1) / (lc + V) with V the corpus' distinct-token
    * count, and log2 as integer bit-length (the
    * [[graft.pipeline.TextAnalysis.bigramSurprisalStats]] kernel — exact
    * in both engines, no float log). The +V denominator is load-bearing:
    * a naive (bc+1)/(lc+1) scores an entirely-unseen bigram as
    * bitlen(1)−bitlen(1) = 0 — i.e. p = 1, the OPPOSITE of unseen —
    * whereas Laplace sends it to −bitlen(V). High weight = looks like
    * the target distribution; the selection step composes downstream
    * ([[calibratedKeep]] on `weight_milli`, or a rate table keyed on
    * weight buckets) — weights and selection are deliberately separate
    * operators, as in the paper.
    *
    * Output per raw doc: (idCol, n_trans, weight_sum, weight_milli =
    * sum×1000 / max(n_trans, 1) — the length-debiased per-transition
    * mean). Docs with < 2 tokens report zeros, never vanish.
    *
    * Scale shape: both LM count tables are vocab²-bounded aggregates
    * joined back on fixed-width token keys (the inverted-index path —
    * neither broadcasts; a 100 TB raw corpus meets a model-sized target
    * corpus only through these aggregates), and the final rollup is one
    * doc-keyed aggregation. The raw corpus is scanned once.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import TextOps.toksS
    def bigramsOf(df: DataFrame, keepId: Boolean): DataFrame = {
      val perDoc = Window.partitionBy(idCol).orderBy("pos")
      val bg = df
        .select(col(idCol), posexplode(expr(toksS(textCol))).as(Seq("pos", "p")))
        .withColumn("c", lead("p", 1).over(perDoc))
        .where(col("c").isNotNull)
      if (keepId) bg.select(col(idCol), col("p"), col("c"))
      else bg.select("p", "c")
    }
    val bg = bigramsOf(raw, keepId = true)
    val tbg = bigramsOf(target, keepId = false)
    val rbc = bg.groupBy("p", "c").agg(count(lit(1)).as("__rbc"))
    val rlc = bg.groupBy("p").agg(count(lit(1)).as("__rlc"))
    val tbc = tbg.groupBy("p", "c").agg(count(lit(1)).as("__tbc"))
    val tlc = tbg.groupBy("p").agg(count(lit(1)).as("__tlc"))
    // each corpus' distinct-token count (the Laplace V): one scalar each,
    // broadcast via a single-row cross join (the tfidfKeywords nDocs idiom)
    val vr = raw.select(explode(expr(toksS(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__vr"))
    val vt = target.select(explode(expr(toksS(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__vt"))
    val agg = bg
      .join(rbc, Seq("p", "c")).join(rlc, Seq("p"))
      .join(tbc, Seq("p", "c"), "left").join(tlc, Seq("p"), "left")
      .crossJoin(broadcast(vr)).crossJoin(broadcast(vt))
      .withColumn("__w", expr(
        """(length(bin(coalesce(__tbc, 0L) + 1L)) - length(bin(coalesce(__tlc, 0L) + greatest(__vt, 1L))))
          | - (length(bin(__rbc + 1L)) - length(bin(__rlc + greatest(__vr, 1L))))"""
          .stripMargin.replace("\n", " ")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trans"), sum(col("__w")).cast("long").as("__ws"))
    raw.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("__ws"), lit(0L)).as("weight_sum"),
        expr("coalesce(__ws, 0L) * 1000L DIV greatest(coalesce(n_trans, 0L), 1L)")
          .as("weight_milli"))
  }
}
