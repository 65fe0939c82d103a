package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-21 plan snapshots: writes `explain("formatted")` for the named
  * queries to plans/r21/<query>_<suffix>.txt (the optimization-round
  * evidence files). Usage: runMain graft.PlanDump21 <suffix> <q1,q2,...>
  * Runs at sf0.01 with the bench's 32-way layout so join/exchange shapes
  * match what Bench times at sf0.1.
  */
object PlanDump21 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    Files.createDirectories(Paths.get("plans", "r21"))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val qe = df.queryExecution
      val txt = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get("plans", "r21", s"${q}_$suffix.txt"), txt)
      println(s"PLAN $q -> plans/r21/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
