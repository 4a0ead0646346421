package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * first stage of any text-curation pipeline (decomposed accents,
  * compatibility leftovers from PDF/HTML extraction, and mixed-form
  * crawl text must collapse to one canonical byte form BEFORE hashing:
  * every downstream dedup/fingerprint operator keys on md5/xxhash of
  * the text, and "café" in NFD vs NFC is two different documents to a
  * hash unless this runs first).
  *
  * Spark has no built-in normalization function (the reference's
  * engines inherit theirs from the host language), so per the extension
  * ladder (built-ins > native Expression with codegen > UDF; SURVEY §4)
  * this is a UnaryExpression whose doGenCode inlines a static call into
  * the surrounding WholeStageCodegen stage — no UDF boxing, no closure
  * serialization, null handling from the nullSafe contract.
  *
  * The fast path matters at corpus scale: real crawl text is almost
  * always ALREADY NFC, and `Normalizer.isNormalized` is a cheap scan
  * (quick-check property table) that lets us return the input
  * UTF8String untouched — no String materialization, no re-encode —
  * paying the full normalize cost only on the rare denormalized row.
  *
  * Engine parity: Java's Normalizer and DuckDB's `nfc_normalize`
  * (utf8proc) both implement Unicode Standard Annex #15 NFC, so
  * md5-of-normalized-text compares clean across the oracle boundary
  * (gated at sf0.01 by `normalize_text_documents`, which PLANTS
  * denormalized rows so the gate cannot pass vacuously on an
  * ASCII-only synthetic corpus).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcText.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcText.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Static helper the generated code calls (an object with no companion
  * class compiles to a plain static forwarder, callable from janino).
  */
object NfcText {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  /** Column-level entry point: NFC-normalize a string column. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
