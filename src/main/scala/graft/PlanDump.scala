package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan snapshots for the optimization-round evidence files: writes
  * `explain("formatted")` for the named queries to
  * plans/<roundDir>/<query>_<suffix>.txt.
  *
  * Usage: runMain graft.PlanDump <roundDir> <suffix> <q1,q2,...>
  * e.g.   runMain graft.PlanDump r22 before ext_frontier,ext_frontier_full
  *
  * Data dir comes from $SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE
  * does not depend on SF; sf0.01 keeps any staging the query triggers
  * cheap). Runs with the bench's 32-way layout so join/exchange shapes
  * match what Bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <roundDir> <suffix> <q1,q2,...>")
    val roundDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get("plans", roundDir))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val qe = df.queryExecution
      val txt = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get("plans", roundDir, s"${q}_$suffix.txt"), txt)
      println(s"PLAN $q -> plans/$roundDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
