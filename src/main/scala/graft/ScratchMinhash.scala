package graft
import org.apache.spark.sql.SparkSession
object ScratchMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      time(s"minhash run $i")(println(
        SparkEntry.queries("ext_dedup_minhash")(spark, "/root/testdata/sf0.1").count()))
      time(s"knn_lsh run $i")(println(
        SparkEntry.queries("ext_knn_lsh")(spark, "/root/testdata/sf0.1").count()))
    }
    spark.stop()
  }
}
