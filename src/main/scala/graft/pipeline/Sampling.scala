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
    // a duplicated stratum key would silently MULTIPLY corpus rows through
    // the left join instead of sampling them. Guard at the cheapest point
    // that still can't be skipped: the usual mixture config is a literal
    // local table, validated driver-side for free (no job — an eager
    // collect here measured +60% on this scan-side operator); anything
    // non-local gets an IN-PLAN flag instead — one global aggregate over
    // the tiny rates table (SinglePartition exchange, never a hash
    // shuffle, so the scan-side plan guard holds) cross-joined back as a
    // 1-row broadcast, raising on execution.
    val guarded = rates.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val i = lr.output.indexWhere(_.name == stratumCol)
        val keys = lr.data.map(_.get(i, lr.output(i).dataType))
        require(keys.distinct.size == keys.size,
          "stratifiedByRate: duplicate rates rows - one rate_ppm per stratum required")
        rates
      case _ =>
        val dupFlag = rates.agg(count(lit(1)).as("__n"),
          size(collect_set(col(stratumCol))).cast("long").as("__d"))
        rates.crossJoin(broadcast(dupFlag))
          .withColumn("rate_ppm", when(col("__n") =!= col("__d"),
              expr("cast(raise_error('stratifiedByRate: duplicate rates rows - one rate_ppm per stratum required') as bigint)"))
            .otherwise(col("rate_ppm")))
          .drop("__n", "__d")
    }
    docs
      .join(broadcast(guarded), Seq(stratumCol), "left")
      .withColumn("__bucket", bucketPpm(idCol))
      .where(col("__bucket") < coalesce(col("rate_ppm"), lit(defaultPpm)))
      .drop("rate_ppm")
      .withColumnRenamed("__bucket", "bucket_ppm")
  }
}
