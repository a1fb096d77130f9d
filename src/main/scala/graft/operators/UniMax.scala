package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", ICLR 2023): distribute a total training-token budget
  * B across languages as UNIFORMLY as possible subject to a
  * max-epochs cap per language (cap_l = E·avail_l) — the principled
  * replacement for temperature sampling (qx34's family) that never
  * over-epochs a low-resource language.
  *
  * The greedy loop of the paper has a closed SORTED form (classic
  * waterfilling): order languages by cap ascending; a PREFIX of
  * languages is capped — exactly those with cap_i·(N−i+1) ≤ B−S_{i−1}
  * (S = cap prefix sum; the condition is monotone along the sort) —
  * and the remainder split the leftover evenly. That form is pure
  * window arithmetic: ONE aggregation for per-language token counts
  * (the only corpus-scale work, map-side combinable) and window
  * functions over the LANGUAGE table (≤ hundreds of rows — the
  * decision table is small by nature; the 100 TB cost is the count
  * pass, which is one scan).
  *
  * Integer-exact: the even split is floor division with the remainder
  * handed to the first `rem` uncapped languages in sort order (ties on
  * cap broken by lang), so Σ alloc = min(B, Σ cap) EXACTLY and both
  * engines agree bit-for-bit. Epochs are reported in micro-units
  * (alloc·10⁶ div avail).
  */
object UniMax {

  /** langTokens(lang, avail) → (lang, avail, cap, alloc, epochs_micro).
    * Budget B = avail_total·budgetNum/budgetDen (integer division),
    * cap = epochsCap·avail. */
  def allocate(langTokens: DataFrame, epochsCap: Long,
               budgetNum: Long, budgetDen: Long): DataFrame = {
    val byCap = Window.orderBy(col("cap"), col("lang"))
    val all = Window.partitionBy()
    langTokens
      .withColumn("cap", col("avail") * epochsCap)
      .withColumn("tot", sum("avail").over(all))
      // `div`, not `/`: Column./ is floating Divide even on longs.
      .withColumn("budget", expr(s"tot * $budgetNum div $budgetDen"))
      .withColumn("i", row_number().over(byCap).cast("long"))
      .withColumn("nlang", count(lit(1)).over(all))
      .withColumn("s_prev",
        coalesce(sum("cap").over(byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // Monotone along the sort, but pin the PREFIX property explicitly
      // so a pathological tie ordering can never split the capped set.
      .withColumn("capped_raw",
        when(col("cap") * (col("nlang") - col("i") + 1L) <= col("budget") - col("s_prev"), 1L)
          .otherwise(0L))
      .withColumn("capped",
        when(sum(lit(1L) - col("capped_raw"))
          .over(byCap.rowsBetween(Window.unboundedPreceding, 0)) === 0L, 1L)
          .otherwise(0L))
      .withColumn("t", sum("capped").over(all))
      .withColumn("s_t", coalesce(sum(when(col("capped") === 1L, col("cap"))).over(all), lit(0L)))
      .withColumn("n_free", col("nlang") - col("t"))
      .withColumn("share", expr(
        "CASE WHEN n_free > 0 THEN (budget - s_t) div n_free ELSE 0L END"))
      .withColumn("rem", expr(
        "CASE WHEN n_free > 0 THEN (budget - s_t) % n_free ELSE 0L END"))
      .withColumn("alloc",
        when(col("capped") === 1L, col("cap"))
          .otherwise(col("share") + when(col("i") - col("t") <= col("rem"), 1L).otherwise(0L)))
      .withColumn("epochs_micro", expr("alloc * 1000000L div avail"))
      .select("lang", "avail", "cap", "alloc", "epochs_micro")
  }
}
