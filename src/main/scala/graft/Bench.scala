package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest SF so JIT/codegen and
    // expression-interpreter compilation aren't charged to the timed run
    // (first execution of the md5/minhash HOF plans is ~10x slower until C2
    // kicks in). Timed queries then measure steady-state throughput.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // best-of-3: the host shows bursty contention (same query varies 10x
    // between adjacent runs, and occasionally two adjacent runs are both
    // hit); the minimum is the faithful steady-state cost
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        // drop every cached plan first: queries that persist intermediate
        // tables (the shared shingle table feeds minhash AND ngram) must
        // each pay their own build — otherwise the one-time materialization
        // bills to whichever query the map iteration happens to run first,
        // and per-query timings swap ~5s when the query set reorders
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
