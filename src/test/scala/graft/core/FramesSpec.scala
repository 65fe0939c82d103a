package graft.core

import graft.SparkSpec
import graft.core.Model._
import graft.core.Payloads._

/** The ToDataFrame analog (borsa/examples/23_dataframe.rs): typed routed
  * payloads lift into DataFrames with schema derived from the case class.
  */
class FramesSpec extends SparkSpec {

  test("a quote lifts into a one-row DataFrame with the full schema") {
    val q = Quote("AAPL", Some(BigDecimal("123.45")), Some(BigDecimal("120")),
      Some("USD"), Some("Apple"), Some("NMS"), Some("REGULAR"), Some(9L))
    val df = Frames.toDF(spark, q)
    assert(df.count() == 1)
    assert(df.columns.toSet == Set("symbol", "price", "previousClose", "currency",
      "shortname", "exchange", "marketState", "dayVolume"))
    assert(df.select("symbol").head.getString(0) == "AAPL")
    assert(BigDecimal(df.select("price").head.getDecimal(0)) == BigDecimal("123.45"))
  }

  test("payload sequences lift with None → null and compose relationally") {
    val rows = Seq(
      StatementRow("2023", "revenue", Some(BigDecimal(100)), Some("USD")),
      StatementRow("2023", "net_income", None, None))
    val df = Frames.toDF(spark, rows)
    assert(df.count() == 2)
    assert(df.where("value IS NULL").count() == 1)
    // relational composition: aggregate over the lifted frame
    assert(df.groupBy("period").count().head.getLong(1) == 2L)
    // holders table
    val holders = Frames.toDF(spark, Seq(
      HolderRow("Fund A", Some(1000L), Some(BigDecimal("0.05")), None, None),
      HolderRow("Fund B", Some(2000L), Some(BigDecimal("0.10")), None, None)))
    assert(holders.agg(org.apache.spark.sql.functions.sum("shares")).head.getLong(0) == 3000L)
  }
}
