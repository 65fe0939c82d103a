package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement-only main (not part of the driver contract): total shuffle
  * bytes written by the [[graft.pipeline.Dedup.duplicateSpans]] step-2 gram
  * exchange, under the r21 16-raw-byte `unhex(md5(...))` key vs the prior
  * 32-hex-char `md5(...)` key — the evidence owed for the "shuffle fewer
  * bytes" (guide §2.3) claim. Both arms run the identical lead-chain gram
  * build and the identical downstream count-window, so the byte DELTA
  * isolates the key's width on the corpus-wide exchange.
  *
  * Usage: runMain graft.ShuffleBytesProbe [sfDir]  (default
  * $SPARK_GRAFT_SF_DIR, else /root/testdata/sf0.1)
  */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.documents(spark, dir)
    val w = 10
    val perDoc = Window.partitionBy("doc_id").orderBy("pos")

    // mirrors duplicateSpans steps 1-2 (lead-chain gram build, then the
    // corpus-wide gh exchange + partition-count window); `key` is the
    // only difference between the arms
    def hits(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      var toks = docs.select(col("doc_id"),
        posexplode(expr(graft.pipeline.TextOps.toksS("text"))).as(Seq("pos", "t")))
      for (i <- 1 until w) toks = toks.withColumn(s"__t$i", lead("t", i).over(perDoc))
      toks.where(col(s"__t${w - 1}").isNotNull)
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("t") +: (1 until w).map(i => col(s"__t$i")): _*).as("__gram"))
        .select(col("doc_id"), col("pos"), key(md5(col("__gram"))).as("gh"))
        .withColumn("__c", count(lit(1)).over(Window.partitionBy("gh")))
        .where(col("__c") > 1)
        .select(col("doc_id"), col("pos"))
    }

    Seq("hex32" -> ((c: org.apache.spark.sql.Column) => c),
        "bin16" -> ((c: org.apache.spark.sql.Column) => unhex(c))).foreach {
      case (name, key) =>
        val bytes = new AtomicLong; val recs = new AtomicLong
        val l = new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val m = sc.stageInfo.taskMetrics
            if (m != null) {
              bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
              recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            }
          }
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        hits(key).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // let the listener bus drain
        spark.sparkContext.removeSparkListener(l)
        println(f"SHUFFLE $name bytesWritten=${bytes.get} recordsWritten=${recs.get} sec=$sec%.2f")
    }
    spark.stop()
  }
}
