package graft
import org.apache.spark.sql.SparkSession
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = SparkEntry.queries("qi_c2_currency")
    (1 to 3).foreach(i => time(s"c2 run $i")(q(spark, dir).count()))
    println("=== c2 plan ===")
    q(spark, dir).explain("formatted")
    println("=== r2 plan ===")
    SparkEntry.queries("qi_r2_daily")(spark, dir).explain("formatted")
    println("=== q2 join plan ===")
    SparkEntry.queries("qi_q2_info_join")(spark, dir).explain("formatted")
    spark.stop()
  }
}
