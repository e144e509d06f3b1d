package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` — Unicode NFC normalization as a native,
  * whole-stage-codegen'd Catalyst expression (SURVEY.md §2.D custom-operator
  * preference (b): Expression beats UDF). The curation pipeline needs
  * canonical composition before hashing/dedup: the same visible text can
  * arrive precomposed (é = U+00E9) or decomposed (e + U+0301) from
  * different crawls, and every downstream fingerprint (d01 exact dedup,
  * d05 shingles, t04 fingerprints) would treat them as distinct documents.
  *
  * Semantics match DuckDB's `nfc_normalize` (both defer to Unicode NFC),
  * which is what makes t17 oracle-checkable. NFC only — ligatures/width
  * folding are NFKC and deliberately out of scope (the oracle engine has
  * no NFKC).
  *
  * Scale: map-only, no state; the `isNormalized` fast path returns the
  * input UTF8String unchanged for already-NFC text (the overwhelmingly
  * common case for ASCII corpora), so the hot loop allocates nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize: expected string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NfcNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
