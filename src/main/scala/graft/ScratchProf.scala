package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway component-level profiler for optimization round 21 (not part
  * of the driver contract). runMain graft.ScratchProf <sfDir> <reps> <probes>
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sel = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SCRATCH_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.PipelineQueries.stageAllDetail(spark, dir)
      .foreach { case (k, v) => println(f"STAGE $k $v%.2f") }
    val probes = graft.pipeline.PipelineQueries.scratchProbes(spark, dir)
    val chosen = if (sel.isEmpty) probes else probes.filter(p => sel.contains(p._1))
    chosen.foreach { case (name, f) =>
      // warm-up pass (JIT/codegen), then timed reps
      try {
        f().count()
        val ts = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime(); val n = f().count(); ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"PROBE $name rows=${ts.head._2} min=${ts.map(_._1).min}%.3f all=" +
          ts.map(x => f"${x._1}%.2f").mkString(","))
      } catch { case e: Throwable => println(s"PROBE $name FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
