package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: time one or more SparkEntry queries repeatedly
  * against an SF dir. Usage: runMain graft.Profile <sfDir> <reps> <q1,q2,...>
  * Prints per-rep wall seconds so cold (first-materialization) and warm
  * costs are visible separately — Bench.scala only reports the min.
  *
  * Reps run ROUND-ROBIN across the queries (rep 1 of every query, then
  * rep 2, ...) — the r16 triage lesson: host contention bursts last tens
  * of seconds, and consecutive blocks of reps on one query mislead by
  * ±0.3 s; interleaving spreads a burst across at most one rep per query.
  *
  * Set SPARK_GRAFT_STAGE=1 to pre-build the staged at-rest tables first
  * (what Bench always does): without it, rep 1 of any staged-table
  * consumer pays the store build and only Bench minimums are comparable.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq else Seq("ext_dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // measurement knob (r21): the driver-side Janino codegen cache is
      // 100 entries by default — far below the bench's working set of
      // distinct whole-stage units, so every rep recompiles every stage.
      // Env-gated here to A/B its effect; Bench pins the winning value.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same JIT warm-up as Bench
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count() catch { case _: Throwable => () }
    }
    if (sys.env.get("SPARK_GRAFT_STAGE").contains("1")) {
      val detail = graft.pipeline.PipelineQueries.stageAllDetail(spark, sfDir)
      detail.foreach { case (k, v) => println(f"PROFILE staging $k sec=$v%.3f") }
    }
    (1 to reps).foreach { r =>
      names.foreach { n =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $n rep=$r rows=$cnt sec=$dt%.3f")
      }
    }
    spark.stop()
  }
}
