package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that make float aggregations bit-deterministic across engines.
  *
  * Summing doubles is order-dependent: Spark and the DuckDB oracle visit
  * rows in different orders, so a raw SUM(double) over >1k rows can differ
  * by more than the comparison tolerance. The fix is to quantize each value
  * to an integer BEFORE aggregating — integer sums are exact in any order —
  * and divide back only at the very end. `floor(x*scale + 0.5)` is a pure
  * IEEE-754 expression (no string round-tripping, unlike round()) so both
  * engines produce the identical integer for the identical input double.
  */
object Determinism {
  /** Quantize a double column to a Long at the given decimal scale. */
  def scaledLong(c: Column, scale: Double): Column =
    floor(c * lit(scale) + lit(0.5)).cast("long")

  /** Exact sum of a double column at fixed decimal scale; emits a Double. */
  def exactSum(c: Column, scale: Double): Column =
    sum(scaledLong(c, scale)).cast("double") / lit(scale)

  /** Exact average: integerized sum divided by count, then unscaled.
    * Shape must be mirrored exactly in the oracle SQL:
    * (CAST(SUM(CAST(FLOOR(x*S + 0.5) AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / S
    */
  def exactAvg(c: Column, scale: Double): Column =
    (sum(scaledLong(c, scale)).cast("double") / count(lit(1)).cast("double")) / lit(scale)
}
