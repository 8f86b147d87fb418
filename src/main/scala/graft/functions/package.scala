package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column functions for the graft engine. */
package object functions {

  /** Money-sum in integer cents: `sum(floor(x*100 + 0.5)) / 100`.
    *
    * Summing integer-valued doubles is EXACT (no accumulation-order
    * float jitter), so the result is bitwise identical across engines
    * and partitionings — unlike `round(sum(x), 2)`, whose input can land
    * arbitrarily close to a 0.005 rounding boundary, and unlike Spark's
    * `round` (exact-decimal HALF_UP) vs DuckDB's (scaled-double round)
    * which disagree on the same double. The oracle SQL uses the same
    * literal formula.
    */
  def moneySum(c: Column): Column = sum(floor(c * 100 + lit(0.5))) / 100

  /** Windowed variant of [[moneySum]] — caller applies `.over(w)` to the
    * inner sum, so expose the pieces instead.
    */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5))
  def fromCents(c: Column): Column = c / 100
}
