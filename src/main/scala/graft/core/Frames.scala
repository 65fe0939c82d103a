package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed-payload → DataFrame bridge — the analog of the reference's
  * `ToDataFrame` feature (borsa/examples/23_dataframe.rs; borsa-core's
  * dataframe feature): every record-level payload the routed verbs return
  * (Quote, SearchResult, holders, statements, news, …) lifts into a Spark
  * DataFrame through its case-class Encoder, so routed results compose
  * with the engine's relational operators (join quotes against candle
  * history, aggregate holder tables, etc.) without hand-written schemas.
  *
  * One generic entry point covers the whole payload surface: all payloads
  * are flat Products of encodable fields (String/Long/Boolean/BigDecimal
  * and Options thereof).
  */
object Frames {

  /** Lift any sequence of case-class payloads into a DataFrame. */
  def toDF[A <: Product : TypeTag](spark: SparkSession, rows: Seq[A]): DataFrame =
    spark.createDataFrame(rows)

  /** Lift one payload (a single-row frame — example 23's quote shape). */
  def toDF[A <: Product : TypeTag](spark: SparkSession, row: A): DataFrame =
    toDF(spark, Seq(row))
}
