package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling joins (builder mandate "salting for skew, AQE for
  * runtime re-plan"): AQE's skew-join split handles most cases at
  * runtime; explicit salting remains the tool when a single hot key
  * dwarfs everything (the ingest workload's "one giant upload" shape).
  *
  * Salting an inner equi-join: the skewed (large) side gets a random
  * salt in [0, n); the small side is replicated across all n salts via
  * a generator — the join key becomes (key, salt), splitting each hot
  * key's rows over n reducers. Result set is identical to the unsalted
  * join (spec-checked).
  */
object SkewJoin {

  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
                      salts: Int = 8): DataFrame = {
    val saltedLarge = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), lit(42)), lit(salts)).cast("int"))
    val replicatedSmall = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
