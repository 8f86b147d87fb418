package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Positionwise equal-element count of two string arrays — the MinHash
  * signature agreement kernel (the estimator compare in q94/q286).
  *
  * Semantically identical to
  * `size(filter(zip_with(a, b, (x,y) -> x = y), b -> b))` including the
  * length-mismatch case (zip_with pads with nulls; null ≠ anything, so
  * the padded tail contributes zero matches — this kernel likewise
  * counts only the common prefix... see below) — EXCEPT that the HOF
  * chain is CodegenFallback: two interpreted lambdas and two array
  * allocations per pair, paid n·f² times in the sampled-pair stage.
  * This expression is one unboxed loop with real `doGenCode`.
  *
  * Length mismatch: matches are counted over min(len) positions — a
  * padded-null position can never compare equal, so this agrees with
  * the HOF form exactly.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_match_count requires (array<string>, array<string>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigMatchCount.evalArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigMatchCount.evalArrays($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchCount =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_count"
}

object SigMatchCount {
  def evalArrays(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      // signature elements are never null (md5 of a non-null shingle);
      // guard anyway so SQL-registered use can't NPE
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getUTF8String(i).equals(b.getUTF8String(i))) m += 1
      i += 1
    }
    m
  }

  /** Column API: positionwise equal count of two string arrays. */
  def sigMatchCount(a: Column, b: Column): Column =
    GraftGlue.column(SigMatchCount(GraftGlue.expression(a), GraftGlue.expression(b)))
}
