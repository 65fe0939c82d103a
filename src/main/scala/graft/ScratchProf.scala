package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway component-level profiler for optimization round 21 (not part
  * of the driver contract). runMain graft.ScratchProf <sfDir> <reps> <probes>
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sel = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SCRATCH_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.get("SCRATCH_SKIP_STAGE").contains("1"))
      graft.pipeline.PipelineQueries.stageAllDetail(spark, dir)
        .foreach { case (k, v) => println(f"STAGE $k $v%.2f") }
    val probes = graft.pipeline.PipelineQueries.scratchProbes(spark, dir)
    val chosen = if (sel.isEmpty) probes else probes.filter(p => sel.contains(p._1))
    // noop sink, NOT count(): count lets the optimizer prune every
    // projected column (and with it the compute under test — guide §1.4),
    // which silently turned the fixture-build probes into row-count scans.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    chosen.foreach { case (name, f) =>
      try {
        // the warm-up pass is reported too: cold − warm ≈ the one-time
        // planning + codegen cost, which is what dominates the staging
        // fixture builds at this SF
        val c0 = System.nanoTime(); run(f()); val cold = (System.nanoTime() - c0) / 1e9
        val ts = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime(); run(f()); (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $name cold=$cold%.3f min=${ts.min}%.3f all=" +
          ts.map(x => f"$x%.2f").mkString(","))
      } catch { case e: Throwable => println(s"PROBE $name FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
