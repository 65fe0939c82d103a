package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchPerf {
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
    val docs = tables.Tables.documents(spark, dir).select("doc_id", "text")
      .unionByName(tables.Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substr(text, instr(text, ' ') + 1)").as("text")))

    import pipeline.TextOps._
    val sh = docs.withColumn("toks", expr(toksS("text")))
      .withColumn("shingles", expr(shinglesS))
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("shingleRows count")(println(sh.count()))
    time("shingleRows count again")(println(sh.count()))
    val selfJoin = sh.as("x").join(sh.as("y"), "sh")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    time("self-join inter count")(println(selfJoin.count()))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val jac = selfJoin
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .select(col("id1"), col("id2"), expr("n_inter * 1000000 DIV (n1 + n2 - n_inter)").as("jaccard_ppm"))
    time("full jaccard top20")(jac.orderBy(col("jaccard_ppm").desc, col("id1"), col("id2")).limit(20).collect())
    val sig = time("minhash signatures")(pipeline.Dedup.minhashSignature(docs).count())
    time("minhash candidates")(println(pipeline.Dedup.minhashCandidates(docs).count()))
    time("minhash near dups")(println(pipeline.Dedup.minhashNearDups(docs).count()))
    spark.stop()
  }
}

object ScratchPerf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = tables.Tables.documents(spark, dir).select("doc_id", "text")
    import pipeline.TextOps._
    val toks = docs.select(col("doc_id"), posexplode(expr(toksS("text"))).as(Seq("pos", "t")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = toks
      .withColumn("t2", lead("t", 1).over(w)).withColumn("t3", lead("t", 2).over(w))
      .where(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("t2"), col("t3")).as("sh"))
      .distinct()
    time("window-lead shingles count")(println(sh.count()))
    time("window-lead shingles again")(println(sh.count()))
    val selfJoin = sh.as("x").join(sh.as("y"), "sh")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    time("self-join inter count")(println(selfJoin.count()))
    spark.stop()
  }
}
