package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: … Gopher", App. A1.1) — the published heuristic
  * rule set a pretraining curation pass runs before any learned
  * classifier (qx63) sees the data. Composes with qx31 (the A1.2
  * repetition screens) and qx7 (the raw stat features).
  *
  * Every threshold is evaluated in PURE INTEGER cross-multiplied form
  * (e.g. mean word length ∈ [3,10] ⇔ 3·n ≤ Σlen ≤ 10·n), so there is
  * no float ratio to drift between engines and the rules are total —
  * no division, no empty-doc guard needed.
  *
  * Rules (fail bit in parentheses):
  *   1 (1)  word count ∈ [50, 100000]
  *   2 (2)  mean word length ∈ [3, 10]
  *   3 (4)  symbol-to-word ratio ≤ 1/10, where symbols are counted as
  *          OCCURRENCES of '#' plus non-overlapping occurrences of
  *          '...' across the raw text (the paper's numerator; a word
  *          with three hashes contributes three)
  *   4 (8)  ≥ 80% of words contain an alphabetic character
  *   5 (16) ≥ 2 stopwords (the corpus stop set {'the','a'}, per qx7)
  *
  * The line-level Gopher rules (bullet-start / ellipsis-end fractions)
  * need multi-line documents; this corpus is single-line by
  * construction (TESTDATA.md), so they are documented N/A rather than
  * computed degenerately. Alpha detection uses translate()-deletion,
  * not a regex, so both engines share exact semantics.
  */
object GopherRules {

  private val WS = "filter(split(text, ' '), w -> length(w) > 0)"

  /** Adds n_words, sum_wc, n_stop, n_alpha, n_sym, fail bits f1..f5,
    * mask and pass to a DataFrame with a `text` column. */
  def withRuleColumns(df: DataFrame): DataFrame =
    df.withColumn("n_words", expr(s"CAST(size($WS) AS BIGINT)"))
      .withColumn("sum_wc", expr(s"aggregate($WS, 0L, (a, w) -> a + length(w))"))
      .withColumn("n_stop", expr(s"CAST(size(filter($WS, w -> w IN ('the', 'a'))) AS BIGINT)"))
      .withColumn("n_alpha", expr(
        s"CAST(size(filter($WS, w -> length(translate(w, 'abcdefghijklmnopqrstuvwxyz', '')) < length(w))) AS BIGINT)"))
      .withColumn("n_sym", expr(
        // Symbol OCCURRENCES (the paper's symbol-to-word ratio numerator),
        // not symbol-bearing words: '#' count plus non-overlapping '...'
        // count, via replace()-deletion (both engines replace left-to-right
        // non-overlapping, so '....' counts one ellipsis in each).
        "CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)" +
          " + CAST((length(text) - length(replace(text, '...', ''))) div 3 AS BIGINT)"))
      .withColumn("f1", when(col("n_words").between(50L, 100000L), 0L).otherwise(1L))
      .withColumn("f2", when(lit(3L) * col("n_words") <= col("sum_wc") &&
        col("sum_wc") <= lit(10L) * col("n_words"), 0L).otherwise(1L))
      .withColumn("f3", when(lit(10L) * col("n_sym") <= col("n_words"), 0L).otherwise(1L))
      .withColumn("f4", when(lit(5L) * col("n_alpha") >= lit(4L) * col("n_words"), 0L).otherwise(1L))
      .withColumn("f5", when(col("n_stop") >= 2L, 0L).otherwise(1L))
      .withColumn("mask",
        col("f1") + lit(2L) * col("f2") + lit(4L) * col("f3") +
          lit(8L) * col("f4") + lit(16L) * col("f5"))
      .withColumn("pass", when(col("mask") === 0L, 1L).otherwise(0L))
}
