package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization (training-data-pipeline storage path): scalar
  * int8 quantization with a per-vector scale — 4× smaller embedding
  * tables for the ANN candidate stage, exact vectors kept only for
  * re-ranking. All arithmetic is builtin transform/aggregate (codegen'd
  * for the quantize path; dequantized similarity reuses FloatVecDot
  * after a cast).
  */
object Quantize {

  /** Per-vector max-abs scale: q = round(x * 127 / scale) clamped to
    * [-127, 127], stored with the scale for dequantization.
    */
  def quantize(embeddings: DataFrame,
               vecCol: String = "embedding"): DataFrame = {
    val scale = greatest(array_max(transform(col(vecCol), x => abs(x))), lit(1e-12f))
    embeddings
      .withColumn("q_scale", scale.cast("float"))
      .withColumn("q_vec",
        transform(col(vecCol), x =>
          greatest(lit(-127),
            least(lit(127), round(x.cast("double") * 127.0 / col("q_scale")).cast("int")))
            .cast("tinyint")))
  }

  /** Dequantize back to float vectors: x ≈ q * scale / 127. */
  def dequantized(qVec: Column, qScale: Column): Column =
    transform(qVec, q => (q.cast("double") * qScale / 127.0).cast("float"))

  /** Approximate cosine on quantized vectors (candidate scoring). */
  def quantizedCosine(aVec: Column, aScale: Column, bVec: Column, bScale: Column): Column = {
    val a = dequantized(aVec, aScale)
    val b = dequantized(bVec, bScale)
    graft.functions.VecOps.vecDot(a, b) /
      (sqrt(graft.functions.VecOps.vecDot(a, a)) * sqrt(graft.functions.VecOps.vecDot(b, b)))
  }
}
