package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min(md5(salt || shingle))` over a shingle array as one native
  * expression.
  *
  * Equivalent to `array_min(transform(sh, s -> md5(salt || s)))` — hex
  * strings compare character-wise exactly as the raw digests compare as
  * unsigned bytes ('0'..'9' < 'a'..'f' matches nibble order), so
  * comparing 16-byte digests and hex-encoding only the winner returns
  * the identical value while skipping per-shingle concat + hex-encode +
  * UTF8String allocation and interpreted lambda dispatch. MD5 stays the
  * hash because the DuckDB oracle can compute it.
  *
  * Real `doGenCode` (a static-helper call, like [[SimHash64]]): the
  * expression itself is a JVM loop either way, but CodegenFallback would
  * break WHOLE-STAGE codegen for every operator fused around it — these
  * are the hottest kernels in the dedup family (q33/q35/q58/q65).
  */
case class MinHashMd5(child: Expression, salt: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_md5 requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val saltBytes = salt.getBytes(StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.evalArray(input.asInstanceOf[ArrayData], saltBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("saltBytes", saltBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHashMd5.evalArray($c, $saltRef);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
  override def prettyName: String = "minhash_md5"
}

object MinHashMd5 {
  def minhashMd5(shingles: Column, salt: String): Column =
    GraftGlue.column(MinHashMd5(GraftGlue.expression(shingles), salt))

  def textMinhashMd5(text: Column, salt: String, k: Int = 3): Column =
    GraftGlue.column(TextMinHashMd5(GraftGlue.expression(text), salt, k))

  def textMinhashMd5Multi(text: Column, salts: Seq[String], k: Int = 3): Column =
    GraftGlue.column(TextMinHashMd5Multi(GraftGlue.expression(text), salts, k))

  // ThreadLocal: several local-mode tasks may evaluate concurrently and
  // MessageDigest is stateful; one instance per thread, shared by both
  // the interpreted and generated paths
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** Static kernel shared by interpreted eval and generated code. */
  def evalArray(arr: ArrayData, saltBytes: Array[Byte]): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = mdLocal.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(saltBytes)
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
      }
      i += 1
    }
    if (best == null) null else UTF8String.fromString(hex(best))
  }

  /** Static kernel for the fused text variant. Never null for non-null
    * input: even empty text yields one (empty) shingle.
    */
  def evalText(text: UTF8String, saltBytes: Array[Byte], k: Int): UTF8String = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val nShingles = math.max(n - k + 1, 1)
    val md = mdLocal.get()
    val space = SpaceBytes
    var best: Array[Byte] = null
    var i = 0
    while (i < nShingles) {
      md.reset()
      md.update(saltBytes)
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) md.update(space)
        md.update(words(j).getBytes(StandardCharsets.UTF_8))
        j += 1
      }
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    UTF8String.fromString(hex(best))
  }

  /** Static kernel for the multi-salt fused variant: tokenize + build
    * each shingle's bytes ONCE, then run every salt's digest over those
    * bytes — element j is bit-identical to `evalText(text, salts(j), k)`
    * (md5(salt ‖ w₀ ‖ ' ' ‖ w₁ …) is one byte stream either way), but the
    * split/slice/UTF-8-encode work no longer multiplies by the salt
    * count. Never null for non-null input, like [[evalText]].
    */
  def evalTextMulti(text: UTF8String, salts: Array[Array[Byte]],
                    k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val nShingles = math.max(n - k + 1, 1)
    val md = mdLocal.get()
    val nSalts = salts.length
    val best = new Array[Array[Byte]](nSalts)
    val wordBytes = new Array[Array[Byte]](n)
    var w = 0
    while (w < n) { wordBytes(w) = words(w).getBytes(StandardCharsets.UTF_8); w += 1 }
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + k, n)
      var len = 0
      var j = i
      while (j < end) { len += wordBytes(j).length + (if (j > i) 1 else 0); j += 1 }
      val sh = new Array[Byte](len)
      var off = 0
      j = i
      while (j < end) {
        if (j > i) { sh(off) = ' '.toByte; off += 1 }
        val wb = wordBytes(j)
        System.arraycopy(wb, 0, sh, off, wb.length)
        off += wb.length
        j += 1
      }
      var s = 0
      while (s < nSalts) {
        md.reset()
        md.update(salts(s))
        md.update(sh)
        val d = md.digest()
        if (best(s) == null || unsignedLess(d, best(s))) best(s) = d
        s += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](nSalts)
    var s = 0
    while (s < nSalts) { out(s) = UTF8String.fromString(hex(best(s))); s += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val SpaceBytes = " ".getBytes(StandardCharsets.UTF_8)

  private[functions] def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray
  private[functions] def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** Fused tokenize→shingle→min-md5: equivalent to
  * `minhash_md5(transform(sequence(...), i -> array_join(slice(split(
  * text, ' '), i, k), ' ')), salt)` but one pass over the text with no
  * intermediate Catalyst arrays — shingle construction (not hashing)
  * dominated the interpreted path. Split semantics mirror Spark's
  * `split(text, " ")` (limit -1: trailing empties kept). Real codegen,
  * same rationale as [[MinHashMd5]].
  */
case class TextMinHashMd5(child: Expression, salt: String, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_minhash_md5 requires string, got ${other.catalogString}")
    }

  @transient private lazy val saltBytes = salt.getBytes(StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.evalText(input.asInstanceOf[UTF8String], saltBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("saltBytes", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashMd5.evalText($c, $saltRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextMinHashMd5 =
    copy(child = newChild)
  override def prettyName: String = "text_minhash_md5"
}

/** Multi-salt [[TextMinHashMd5]]: `array(text_minhash_md5(t, s₀),
  * text_minhash_md5(t, s₁), …)` as ONE pass — element j is bit-identical
  * to the single-salt expression under salt j, but tokenization and
  * shingle-byte construction (the dominant cost; see the q94 in-code
  * note) happen once instead of once per salt. Used by the estimator
  * signature in Dedup.minhashAccuracy (8 salts → 8× fewer text scans).
  * Real codegen, same rationale as [[MinHashMd5]].
  */
case class TextMinHashMd5Multi(child: Expression, salts: Seq[String], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_minhash_md5_multi requires string, got ${other.catalogString}")
    }

  @transient private lazy val saltBytes: Array[Array[Byte]] =
    salts.map(_.getBytes(StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.evalTextMulti(input.asInstanceOf[UTF8String], saltBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("saltBytes", saltBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashMd5.evalTextMulti($c, $saltRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextMinHashMd5Multi =
    copy(child = newChild)
  override def prettyName: String = "text_minhash_md5_multi"
}
