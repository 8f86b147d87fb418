package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer squared-L2 distance between two bigint vectors — the
  * clustering kernel (Clustering.sqDist) as a native expression.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)`: a
  * sequential primitive fold, bit-identical to the HOF formulation and
  * to the oracle's list_sum/list_transform arithmetic (integer sums are
  * order-independent anyway). That includes the length-mismatch case:
  * zip_with pads the shorter array with nulls, so the HOF form yields
  * NULL on unequal lengths — and so does this expression (the function
  * is SQL-registered, so arbitrary user inputs can reach it).
  * Spark's higher-order functions are
  * CodegenFallback — per-row interpreted lambda dispatch — so the k×n
  * assignment cross-join pays boxed evaluation k·D times per vector;
  * this expression keeps the whole assignment projection inside one
  * WholeStageCodegen span with an unboxed long loop.
  */
case class LongVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }

  // Null on length mismatch (see doc comment), so the result can be null
  // even when both inputs are non-null.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    if (x.length != y.length) return null
    val n = x.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x(i) - y(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongVecSqDist =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

object LongVecSqDist {
  /** Column API: exact integer squared-L2 of bigint vectors. */
  def sqDist(a: Column, b: Column): Column =
    GraftGlue.column(LongVecSqDist(GraftGlue.expression(a), GraftGlue.expression(b)))
}
