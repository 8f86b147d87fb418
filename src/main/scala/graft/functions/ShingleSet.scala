package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize→k-shingle→distinct: equivalent to
  * `array_distinct(transform(sequence(1, greatest(size(words)-k+1, 1)),
  * i -> array_join(slice(split(text, ' '), i, k), ' ')))` but ONE pass
  * over the text with no intermediate Catalyst arrays — the interpreted
  * HOF chain allocates a words array, a sequence array, and a slice +
  * join per element, and dominated q34/q58's shingle sides the same way
  * shingle construction dominated the minhash path before
  * [[TextMinHashMd5]]. Split semantics mirror Spark's `split(text, " ")`
  * (limit -1: trailing empties kept); distinct keeps first-occurrence
  * order like `array_distinct`. Real codegen via a static-helper call,
  * same rationale as [[MinHashMd5]].
  */
case class ShingleSet(child: Expression, k: Int, stride: Int = 1,
                      distinct: Boolean = true, exact: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_set requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleSet.evalText(input.asInstanceOf[UTF8String], k, stride, distinct, exact)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleSet.evalText($c, $k, $stride, $distinct, $exact)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

object ShingleSet {
  def shingleSet(text: Column, k: Int = 3): Column =
    GraftGlue.column(ShingleSet(GraftGlue.expression(text), k))

  /** Non-distinct strided windows — the chunk-hashing shape (q73/q75):
    * every window survives (duplicates included, offsets `stride`
    * apart), matching `transform(sequence(1, greatest(n-k+1, 1),
    * stride), i -> array_join(slice(words, i, k), ' '))`.
    */
  def shingleWindows(text: Column, k: Int, stride: Int = 1): Column =
    GraftGlue.column(ShingleSet(GraftGlue.expression(text), k, stride, distinct = false))

  /** Full windows ONLY — a doc shorter than `k` words yields an empty
    * array instead of one truncated window. This is what makes
    * multi-width single-scan matching sound (q75): a full `k`-window
    * carries exactly `k−1` separator spaces (words contain none), so
    * full windows are string-partitioned by width and widths can be
    * unioned into ONE explode without cross-width collisions — whereas
    * a truncated width-k window of an n<k-word doc has n−1 spaces and
    * WOULD collide with genuine width-n windows.
    */
  def shingleWindowsExact(text: Column, k: Int, stride: Int = 1): Column =
    GraftGlue.column(ShingleSet(GraftGlue.expression(text), k, stride,
      distinct = false, exact = true))

  /** Static kernel shared by interpreted eval and generated code. Never
    * null for non-null input: even empty text yields one (empty)
    * shingle, matching `sequence(1, greatest(n-k+1, 1), stride)`.
    * `distinct = true` keeps first-occurrence order like
    * `array_distinct`; `false` emits every window.
    */
  def evalText(text: UTF8String, k: Int, stride: Int = 1,
               distinct: Boolean = true, exact: Boolean = false): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    if (exact && n < k) return new GenericArrayData(Array.empty[Any])
    val nShingles = math.max(n - k + 1, 1)
    val acc: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](math.min(nShingles * 2, 1 << 16))
      else new java.util.ArrayList[String]((nShingles + stride - 1) / stride)
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + k, n)
      var len = end - i - 1
      var j = i
      while (j < end) { len += words(j).length; j += 1 }
      val sb = new java.lang.StringBuilder(len)
      j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      acc.add(sb.toString)
      i += stride
    }
    val out = new Array[Any](acc.size)
    val it = acc.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}
