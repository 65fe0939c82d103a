package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus monitoring — the data-versioning primitives
  * a training-data platform runs between corpus builds: WHAT changed
  * (per-document diff keyed on content fingerprints) and whether the
  * embedding space MOVED (per-dimension drift). A corpus rebuild that
  * silently swaps 30% of its documents, or an embedding model upgrade
  * that shifts the space under a frozen ANN index, should fail a release
  * gate before a training run pays for it; these are the tables that
  * gate reads.
  *
  * Scale shape: the diff joins fixed-width (id, md5) projections — the
  * text itself never rides through the join; drift is one explode +
  * per-dimension aggregation on each side (dims are model-sized, the
  * output is dim-count rows). Both are one-shuffle operators.
  */
object Versioning {

  /** Per-document DIFF between two corpus snapshots keyed on `idCol`,
    * compared by content md5. Output (idCol, status) with status in
    * {'added', 'removed', 'changed', 'unchanged'} — `added` rows exist
    * only in `newer`, `removed` only in `older`, `changed` in both with
    * different bytes. Deterministic, order-free; feed it to a release
    * gate as counts or join it back for the changed-doc sample.
    *
    * PRECONDITION, enforced loudly: `idCol` is unique on each side. A
    * duplicated id would fan out through the full-outer join and
    * silently misreport statuses; instead each side aggregates per id
    * and an in-plan guard raises on any id seen twice (the repo's
    * fail-fast convention — same shuffle key as the join, so AQE reuses
    * the exchange and the guard costs no extra pass).
    */
  def corpusDiff(
      older: DataFrame,
      newer: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // presence is tracked by explicit flags, NOT by hash nullability — a
    // NULL-text document would otherwise hash NULL and masquerade as
    // absent ("added"/"removed" for a doc present on both sides); NULL
    // text itself hashes like empty text (documented equivalence)
    def side(df: DataFrame, h: String, p: String, label: String) = df
      .select(col(idCol), md5(coalesce(col(textCol), lit(""))).as(h))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__c"), max(col(h)).as(h))
      .select(col(idCol),
        when(col("__c") > 1, raise_error(concat(
          lit(s"corpusDiff: duplicate $idCol in $label snapshot: "),
          col(idCol).cast("string")))).otherwise(col(h)).as(h),
        lit(true).as(p))
    val o = side(older, "__ho", "__po", "older")
    val n = side(newer, "__hn", "__pn", "newer")
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Summary of [[corpusDiff]]: (status, n_docs) — the four numbers a
    * release gate thresholds on (e.g. "changed+removed below 1% or a
    * human signs off").
    */
  def corpusDiffSummary(
      older: DataFrame,
      newer: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    corpusDiff(older, newer, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))

  /** Per-dimension embedding DRIFT between two snapshots: integer-ppm
    * means on both sides and their delta — the cheapest signal that the
    * space moved under a frozen index (trained IVF cells / PQ codebooks
    * assume the distribution they were fit on; a mean shift is the
    * first-order alarm that routing and reconstruction quality are about
    * to decay, before `knnRecall` confirms it). Exact integer arithmetic
    * (sum of floor-ppm components DIV count) so the report is
    * cross-engine hashable and never rounding-noisy.
    *
    * NULL vectors are excluded on each side independently; dimensions
    * come from position, and the sides FULL-OUTER join on the dim so an
    * embedding-WIDTH change between snapshots is visible as rows with a
    * NULL mean on one side (an inner join would silently narrow the
    * report to the common prefix — exactly the kind of model swap this
    * monitor exists to catch).
    */
  def embeddingDrift(
      older: DataFrame,
      newer: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def dimMeans(df: DataFrame, out: String) = df
      .where(col(vecCol).isNotNull)
      .select(posexplode(expr(
        s"transform($vecCol, x0 -> cast(floor(cast(x0 as double) * 1000000) as bigint))"))
        .as(Seq("dim", "__p")))
      .groupBy("dim")
      // embedding sums go negative; both Spark's DIV and DuckDB's //
      // truncate toward zero (checked, not assumed), so the integer
      // mean is cross-engine exact without a sign adjustment
      .agg(expr("sum(__p) DIV count(1)").as(out))
    dimMeans(older, "mean_old_ppm")
      .join(dimMeans(newer, "mean_new_ppm"), Seq("dim"), "full_outer")
      .select(col("dim").cast("long").as("dim"),
        col("mean_old_ppm"), col("mean_new_ppm"),
        (col("mean_new_ppm") - col("mean_old_ppm")).as("delta_ppm"))
  }
}
