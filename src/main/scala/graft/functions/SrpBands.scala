package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-projection (hyperplane) LSH band keys for an embedding
  * vector — the Charikar-2002 scheme: bit_j = (v · r_j >= 0), packed
  * `bitsPerBand` bits per band, one band key per output element. Two
  * vectors collide in a band with probability (1 - θ/π)^bitsPerBand, so
  * near-duplicates (θ→0) collide in some band almost surely while random
  * pairs don't — the embedding-space analogue of MinHash banding.
  *
  * The plane matrix is a REFERENCED OBJECT (one plan node regardless of
  * bands × bits × dim — the same fix NearestCell got for literal-tree
  * blowup). Each dot is the sequential ascending double fold shared by
  * every vector kernel here ([[FloatVecDot]]), so an oracle can re-derive
  * the exact bits with `list_sum(list_transform(...))` arithmetic; the
  * ±1 plane entries are exact in float/double, which makes the fold
  * bit-identical across engines.
  */
case class SrpBandKeys(child: Expression, planes: Array[Array[Float]], bitsPerBand: Int)
    extends UnaryExpression {

  require(bitsPerBand > 0 && bitsPerBand <= 63, "bitsPerBand must be in [1, 63]")
  require(planes.length % bitsPerBand == 0,
    s"planes (${planes.length}) must be a multiple of bitsPerBand ($bitsPerBand)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_band_keys requires array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SrpBandKeys.evalVec(input.asInstanceOf[ArrayData], planes, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpBandKeys.evalVec($c, $pRef, $bitsPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
  override def prettyName: String = "srp_band_keys"
}

object SrpBandKeys {

  /** Static kernel shared by interpreted eval and generated code.
    *
    * Dimension mismatches truncate the fold to the shorter of vector and
    * plane (the [[FloatVecDot]] convention — callers own dimension
    * agreement; the planes() caller passes `dim` explicitly). Note the
    * degenerate case every SRP scheme shares: an all-zero (or empty)
    * vector has dot 0 against every plane, so `>= 0` sets every bit and
    * all such vectors collide — harmless for near-dup use (they ARE
    * mutual duplicates) but worth knowing when vectors can be null-ish.
    */
  def evalVec(vec: ArrayData, planes: Array[Array[Float]], bitsPerBand: Int): GenericArrayData = {
    val v = vec.toFloatArray()
    val nBands = planes.length / bitsPerBand
    val keys = new Array[Long](nBands)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.length, p.length)
      var dot = 0.0
      var k = 0
      while (k < n) { dot += v(k).toDouble * p(k).toDouble; k += 1 }
      if (dot >= 0.0) keys(j / bitsPerBand) |= 1L << (j % bitsPerBand)
      j += 1
    }
    new GenericArrayData(keys)
  }

  /** Deterministic ±1 hyperplanes derived from MD5 — sign j,k = +1 iff
    * the first hex digit of md5("srp:j:k") is 0–7 (top bit of the first
    * byte clear). Public-hash derivation so an external oracle can
    * reproduce the exact planes; ±1 entries (instead of Gaussians) keep
    * every dot-product term exact in double.
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(nPlanes) { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { k =>
        md.reset()
        val d = md.digest(s"srp:$j:$k".getBytes("UTF-8"))
        if ((d(0) & 0x80) == 0) 1.0f else -1.0f
      }
    }

  def srpBandKeys(vec: Column, planes: Array[Array[Float]], bitsPerBand: Int): Column =
    GraftGlue.column(SrpBandKeys(GraftGlue.expression(vec), planes, bitsPerBand))
}
