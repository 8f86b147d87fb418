package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level Shannon-entropy statistics in one pass per row:
  * (n_chars, n_distinct, Σ p·ln p). The first formulation composed
  * interpreted higher-order functions (filter-inside-aggregate over the
  * split-char array) and cost ~14 s at sf0.1 — O(n·|alphabet|) of lambda
  * dispatch per document; this kernel is the same arithmetic as a
  * primitive loop (~40× on the bench, the MinHashMd5/RepetitionStats
  * lesson applied again).
  *
  * Determinism contract: the Σ p·ln p fold runs over the alphabet in
  * ASCENDING CODE-POINT order — identical to folding a sorted distinct
  * char list on any engine (code-point order == UTF-8 binary order), so
  * an oracle can mirror it with list_sort + a sequential list_sum.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropyStats.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy_stats requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CharEntropyStats.evalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyStats.evalText($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
  override def prettyName: String = "char_entropy_stats"
}

object CharEntropyStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_plogp", DoubleType, nullable = false)))

  def charEntropyStats(text: Column): Column =
    GraftGlue.column(CharEntropyStats(GraftGlue.expression(text)))

  /** Static kernel shared by interpreted eval and generated code. */
  def evalText(text: UTF8String): InternalRow = {
    val s = text.toString
    // counts keyed by code point; TreeMap keeps the ascending-code-point
    // fold order the determinism contract requires
    val counts = new java.util.TreeMap[Integer, Integer]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sum = 0.0
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        // StrictMath.log, not Math.log: Spark's ln expression evaluates
        // through StrictMath, and the two differ in the last ulp for
        // some inputs — CharEntropySpec pins bit-equality with the
        // relational formulation (and hence with the DuckDB oracle)
        sum += p * java.lang.StrictMath.log(p)
      }
    }
    InternalRow(n, counts.size().toLong, sum)
  }
}
