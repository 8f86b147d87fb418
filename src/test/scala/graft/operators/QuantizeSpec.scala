package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize bounds values to int8 and preserves scale") {
    val emb = graft.Tables(spark, sf("")).embeddings.limit(100)
    val q = Quantize.quantize(emb)
    val bad = q.select(explode(col("q_vec")).as("v")).filter(abs(col("v")) > 127).count()
    assert(bad == 0)
    assert(q.filter(col("q_scale") <= 0).count() == 0)
  }

  test("dequantized cosine approximates exact cosine within 2%") {
    val emb = graft.Tables(spark, sf("")).embeddings.limit(50)
    val q = Quantize.quantize(emb)
    val a = q.as("a")
    val b = q.as("b")
    val pairs = a.join(b, col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("exact"),
        Quantize.quantizedCosine(col("a.q_vec"), col("a.q_scale"),
                                 col("b.q_vec"), col("b.q_scale")).as("approx"))
    val maxErr = pairs.select(max(abs(col("exact") - col("approx")))).head().getDouble(0)
    assert(maxErr < 0.02, s"max quantization error $maxErr")
  }
}
