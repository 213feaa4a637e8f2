package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[NfcNormalize]] — a plain object so generated code
  * can call it through the static forwarder (`NfcHelper.nfc(...)`).
  * The `isNormalized` probe is the fast path: ASCII (and any
  * already-composed) text returns the INPUT UTF8String untouched — no
  * String materialization survives — so a 100 TB mostly-ASCII corpus
  * pays one linear scan per value, not an allocation per value.
  */
object NfcHelper {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC (canonical composition) normalization of a string column.
  *
  * Spark ships no Unicode-normalization builtin; text dedup/fingerprint
  * pipelines need one — "é" as U+00E9 and as U+0065 U+0301 must hash
  * identically or every downstream exact-dedup key silently splits.
  * Implemented as a native unary expression (stays inside whole-stage
  * codegen; a Scala UDF here would break the hot text path's codegen
  * span) delegating to `java.text.Normalizer` — the same Unicode
  * canonical-composition tables DuckDB's `nfc_normalize` applies, which
  * is what lets the oracle hash-compare results.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcHelper.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API front door for the native text expressions. */
object TextFunctions {
  /** Unicode NFC canonical composition of a string column. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
