package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** AHO-CORASICK multi-pattern matcher compiled to a byte-level DFA —
  * the scale path [[graft.operators.TextAnalysis.blocklistScan]]'s doc
  * promises: a compiled regex alternation re-scans from every position
  * and degrades with |patterns|, while this automaton visits each input
  * byte EXACTLY ONCE regardless of how many patterns are loaded
  * (Aho & Corasick, CACM 1975).
  *
  * The goto table is fail-compiled into a dense next[state][byte] DFA at
  * construction (no fail-chasing in the scan loop), and each state's
  * output list is pre-merged through its fail chain, so the hot loop is
  * one array index + one (usually empty) output sweep per byte.
  *
  * Counting semantics: ALL occurrences, overlapping included — every
  * position where a pattern ends counts it once (the classic AC
  * contract; `regexp_extract_all` counts non-overlapping resumptions
  * instead, so the two agree exactly when no two matches overlap).
  */
final class AcAutomaton(patternBytes: Array[Array[Byte]]) extends Serializable {
  val nPatterns: Int = patternBytes.length

  // next(s)(b): fail-compiled transition; out(s): pattern indices whose
  // match ends entering s (merged through the fail chain)
  private val (next, out) = {
    val goTo = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for (pi <- patternBytes.indices) {
      var s = 0
      for (b <- patternBytes(pi)) {
        val c = b & 0xff
        if (goTo(s)(c) == -1) {
          goTo += Array.fill(256)(-1); outB += Nil
          goTo(s)(c) = goTo.length - 1
        }
        s = goTo(s)(c)
      }
      outB(s) = pi :: outB(s)
    }
    val fail = new Array[Int](goTo.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val s = goTo(0)(c)
      if (s == -1) goTo(0)(c) = 0 else { fail(s) = 0; queue += s }
      c += 1
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      c = 0
      while (c < 256) {
        val u = goTo(r)(c)
        if (u == -1) goTo(r)(c) = goTo(fail(r))(c)
        else {
          fail(u) = goTo(fail(r))(c)
          outB(u) = outB(u) ++ outB(fail(u))
          queue += u
        }
        c += 1
      }
    }
    (goTo.toArray, outB.map(_.toArray.sorted).toArray)
  }

  /** Add each pattern's occurrence count in `bytes` into `counts`. */
  def countInto(bytes: Array[Byte], counts: Array[Long]): Unit = {
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = next(s)(bytes(i) & 0xff)
      val o = out(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
  }
}

/** `multi_pattern_counts(text)` → array<long>: per-pattern TOTAL
  * occurrence counts (overlapping included), aligned with the pattern
  * list order. One automaton pass per row; the automaton is built once
  * on the driver and ships to executors as a codegen reference object.
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_counts requires a non-empty list of non-empty patterns")

  @transient private lazy val automaton = MultiPatternCounts.automatonFor(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_pattern_counts requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MultiPatternCounts.evalWith(automaton, input.asInstanceOf[UTF8String])

  /** Reference-object codegen (the [[SrpBands]] pattern): the automaton
    * rides the generated class as a typed field, so the projection stays
    * inside whole-stage codegen and the scan loop is compiled JVM code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MultiPatternCounts.evalWith($acRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
  override def prettyName: String = "multi_pattern_counts"
}

object MultiPatternCounts {
  // one automaton per distinct pattern list per JVM (driver builds it
  // for codegen; executors deserialize the reference object instead,
  // and interpreted-path tasks rebuild at most once per list)
  private val cache = new java.util.concurrent.ConcurrentHashMap[Seq[String], AcAutomaton]()

  def automatonFor(patterns: Seq[String]): AcAutomaton =
    cache.computeIfAbsent(patterns,
      p => new AcAutomaton(p.map(_.getBytes("UTF-8")).toArray))

  def evalWith(ac: AcAutomaton, s: UTF8String): GenericArrayData = {
    val counts = new Array[Long](ac.nPatterns)
    ac.countInto(s.getBytes, counts)
    new GenericArrayData(counts)
  }

  /** Column API: `multiPatternCounts(col("text"), Seq("a", "ab"))`. */
  def counts(text: Column, patterns: Seq[String]): Column =
    GraftGlue.column(MultiPatternCounts(GraftGlue.expression(text), patterns))
}
