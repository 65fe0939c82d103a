package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    Seq("qi_r2_daily", "qi_m1_merge", "qi_q5_revenue", "ext_dedup_minhash", "qi_st8_gate",
      "qi_h9_keepna", "qi_h8_bulk", "ext_knn_lsh", "qi_asof_price", "qi_range_join",
      "ext_knn_ivf", "ext_dedup_lines", "ext_pii_scrub", "qi_q3_shipping", "qi_q18_bigorders", "qi_skew_salted", "qi_anti_churn", "qi_rollup_orders", "qi_adjust_divs",
      "ext_pack_chunks", "ext_pack_spans", "ext_knn_pq", "ext_overlap_matrix",
      "ext_semdedup_incr", "ext_manifest", "ext_calibrated", "ext_datacard",
      "ext_cluster_centroids", "ext_chunks_overlap", "ext_session_docs",
      "ext_bpe_decode").foreach { q =>
      println(s"######## $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
