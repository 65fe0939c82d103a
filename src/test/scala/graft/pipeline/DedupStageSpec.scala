package graft.pipeline

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The staged-shingle-table path (ShingleStage + *Of variants) must be a
  * pure optimization: identical results to the derive-per-query forms, and
  * the staged doc-id aggregations must read the buckets co-located — no
  * exchange in the signature plan.
  */
class DedupStageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame = Tables.documents(spark, dir).select("doc_id", "text")

  private def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  test("staged minhash near-dups == derive-per-query minhash near-dups") {
    val staged = ShingleStage.shingleHashes(spark, s"$dir#spec", docs)
    val got = rows(Dedup.minhashNearDupsOf(staged, 200000L))
    val want = rows(Dedup.minhashNearDups(docs, 200000L))
    assert(got == want)
  }

  test("staged ngram Jaccard == derive-per-query ngram Jaccard (df-capped)") {
    val staged = ShingleStage.shingleHashes(spark, s"$dir#spec", docs)
    val got = rows(Dedup.ngramJaccardPairsOf(staged.select("doc_id", "sh"), dfCap = 64L))
    val want = rows(Dedup.ngramJaccardPairs(docs, dfCap = 64L))
    assert(got == want)
  }

  test("signature aggregation over the staged table plans NO exchange (bucket co-location)") {
    val staged = ShingleStage.shingleHashes(spark, s"$dir#spec", docs)
    val plan = Dedup.minhashSignatureOf(staged).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed scan should satisfy the groupBy(doc_id) distribution:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan is not bucket-aware:\n$plan")
  }

  test("staging is once-per-corpus: second call reads the same managed table") {
    ShingleStage.shingleHashes(spark, s"$dir#spec", docs)
    assert(spark.catalog.tableExists("graft_shingles__root_testdata_sf0_001_spec"))
    // second call must NOT re-evaluate docs: poison the thunk
    val again = ShingleStage.shingleHashes(spark, s"$dir#spec",
      sys.error("re-staged despite cache"))
    assert(again.columns.toSeq == Seq("doc_id", "sh", "h"))
  }
}
