package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition signals (Rae et al. 2021 §A1.1: documents
  * dominated by one token or by repeated n-grams are low-quality) in ONE
  * pass per row: token count, most-frequent-token fraction, and
  * duplicate-bigram fraction — the per-document quality gates a corpus
  * filter applies before training. A relational formulation explodes
  * tokens and shuffles on (doc, token); this kernel keeps the whole
  * computation next to the row (raw tokens never shuffle — same design
  * argument as the heavy-hitters sketch), returning a struct of
  * (n_words, top_word_frac, dup_bigram_frac). Split semantics mirror
  * Spark's `split(text, " ")`.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.evalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.evalText($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false)))

  def repetitionStats(text: Column): Column =
    GraftGlue.column(RepetitionStats(GraftGlue.expression(text)))

  /** Static kernel shared by interpreted eval and generated code. */
  def evalText(text: UTF8String): InternalRow = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val counts = new java.util.HashMap[String, Int](n * 2)
    var maxCount = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(words(i), 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val nBigrams = n - 1
    var dupFrac = 0.0
    if (nBigrams > 0) {
      val seen = new java.util.HashSet[String](nBigrams * 2)
      i = 0
      while (i < nBigrams) {
        // the \u001f joint cannot occur inside a space-split token
        seen.add(words(i) + '\u001f' + words(i + 1))
        i += 1
      }
      dupFrac = (nBigrams - seen.size).toDouble / nBigrams
    }
    InternalRow(n.toLong, maxCount.toDouble / n, dupFrac)
  }
}
