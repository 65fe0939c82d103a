package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** `SparkSessionExtensions` wiring: registers the engine's custom
  * expressions for SQL use, so `spark.sql("... tz_bucket(secs, tz, mode)")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` — or retrofit an existing
  * session via [[GraftExtensions.register]].
  *
  * tz_bucket(secs BIGINT, zone STRING-literal, mode BIGINT-literal):
  * mode 0 = local day, 1 = local Monday week, >=60 = minute step seconds.
  * vec_dot(a ARRAY<FLOAT|DOUBLE>, b ARRAY<FLOAT|DOUBLE>): codegen'd strict
  * left-to-right dot product (the similarity kernel), NULL on length
  * mismatch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.tzBucketDescriptor)
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.nfcDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "tz_bucket(secs, zone, mode)")
    val zone = exprs(1) match {
      case lit if lit.foldable => lit.eval(null).toString
      case other => throw new IllegalArgumentException(s"tz_bucket zone must be a literal, got $other")
    }
    val mode = exprs(2) match {
      case lit if lit.foldable => lit.eval(null).toString.toLong
      case other => throw new IllegalArgumentException(s"tz_bucket mode must be a literal, got $other")
    }
    TzBucket(exprs.head, zone, mode)
  }

  val tzBucketDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("tz_bucket"),
    new ExpressionInfo(classOf[TzBucket].getName, "tz_bucket"),
    build _)

  private def buildVecDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot(a, b)")
    VecDot(exprs.head, exprs(1))
  }

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    buildVecDot _)

  private def buildNfc(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "nfc_normalize(s)")
    NfcNormalize(exprs.head)
  }

  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    buildNfc _)

  /** Retrofit registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tz_bucket", build _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", buildVecDot _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", buildNfc _, "scala_udf")
  }
}
