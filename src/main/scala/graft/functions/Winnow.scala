package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003 — the MOSS algorithm): Karp-Rabin rolling hashes over
  * character k-grams, keeping the minimum hash of every w-hash window
  * (rightmost on ties). Guarantees: any shared substring of length
  * ≥ w + k - 1 contributes at least one common fingerprint — the
  * standard containment-dedup primitive for training corpora.
  *
  * Native Catalyst expression (string → sorted distinct array<long>):
  * one pass, O(n) per document, no UDF boxing.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.evalBytes(input.asInstanceOf[UTF8String], k, w)

  /** Static-helper codegen (same rationale as [[MinHashMd5]]): keeps the
    * surrounding projection inside whole-stage codegen.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.evalBytes($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  private val Base = 1000003L

  /** Shared kernel for the interpreted and generated paths. */
  def evalBytes(s: UTF8String, k: Int, w: Int): GenericArrayData =
    new GenericArrayData(fingerprints(s.getBytes, k, w))

  /** Rolling-hash winnowing over bytes; returns sorted distinct mins. */
  def fingerprints(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length
    if (n < k) return Array(hashRange(bytes, 0, n))
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    // precompute Base^(k-1) for the rolling update
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = finalize(h)
    i = 1
    while (i < nHashes) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = finalize(h)
      i += 1
    }
    if (nHashes <= w) return Array(hashes.min)
    // winnow: min of each w-window, rightmost on ties
    val out = scala.collection.mutable.TreeSet.empty[Long]
    var start = 0
    while (start + w <= nHashes) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    out.toArray
  }

  /** Mix the raw polynomial hash so byte-local inputs spread. */
  private def finalize(h: Long): Long = {
    var x = h
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    x
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    finalize(h)
  }

  /** Column API: winnowing fingerprints with k-gram size `k`, window `w`. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    GraftGlue.column(WinnowFingerprints(GraftGlue.expression(text), k, w))
}
