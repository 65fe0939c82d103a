package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel (UAX #15 canonical composition) —
  * the first pass of any text-cleaning pipeline: the SAME user-visible
  * string can arrive as composed ("é" U+00E9) or decomposed
  * ("e"+U+0301) bytes, and every byte-keyed operator downstream (exact
  * dedup's md5, shingle hashing, BPE's character split, PII regexes)
  * treats them as DIFFERENT documents unless ingestion canonicalizes.
  *
  * The already-normalized fast path matters at scale: real corpora are
  * overwhelmingly NFC already, and `Normalizer.isNormalized` is a scan
  * without allocation — the quick-check property of UAX #15 — so the
  * common case costs one pass and zero copies (the input UTF8String is
  * returned as-is).
  */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native `nfc_normalize(string)` Catalyst expression — codegen'd
  * (stays inside whole-stage codegen; the Spark SQL builtin surface has
  * no Unicode normalizer, and a Scala UDF would box every row and break
  * codegen). DuckDB ships `nfc_normalize` natively, and both implement
  * UAX #15, so results hash cross-engine. NULL in, NULL out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcKernel.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def of(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
