package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression
  * over `java.text.Normalizer` — the text-pipeline canonicalization step
  * Spark lacks as a builtin (composed vs decomposed accents, fullwidth
  * forms, ligatures all hash differently, so dedup and exact-match
  * decontamination silently miss equivalent text without it).
  *
  * Scale shape: a narrow per-row projection, fully inside whole-stage
  * codegen like the other graft kernels. The kernel short-circuits via
  * `Normalizer.isNormalized` — for the dominant already-NFC case
  * (ASCII and most real-world UTF-8) it returns the INPUT UTF8String
  * untouched, no String decode/re-encode round trip.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString(", ")}, got $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string, got ${other.catalogString}")
    }

  // resolve the enum once per expression, not per row (the constructor
  // require() already guarantees valueOf succeeds)
  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      // form names ARE the enum constant names, so the generated code
      // references the constant directly — no per-row valueOf
      c => s"graft.functions.UnicodeNormalize.normalize($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftGlue.column(UnicodeNormalize(GraftGlue.expression(text), form))

  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(text: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }
}
