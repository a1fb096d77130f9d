package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction with delta-gap postings — the retrieval
  * build step behind qx54's BM25 scoring and qx79's lexical leg,
  * promoted to a first-class operator: per term, the sorted posting
  * list is delta-encoded (first docid + 1, then gaps) and accounted in
  * LEB128/varint bytes, the way a Lucene-style segment sizes itself.
  *
  * Scale shape: one explode + two key-partial aggregations (term,doc →
  * tf; term → postings). The per-term sorted collect IS the posting
  * build — bounded by df, which production bounds by SEGMENTING: a
  * 100 TB index builds per-partition segments and merges, never one
  * global list per term; the delta+varint arithmetic here is exactly
  * the per-segment encoder. Gaps are strictly positive (docids
  * distinct; the first entry is docid+1 so docid 0 stays ≥ 1), which
  * keeps `bin()` well-defined in both engines.
  *
  * Varint size of a gap g ≥ 1 is ⌈bits(g)/7⌉ = (length(bin(g))+6) div 7
  * — pure integer, identical in DuckDB with `//`.
  */
object InvertedIndex {

  val P = 2147483647L

  /** docs(doc_id, text) → one row per term: df, cf, first_doc,
    * gap_checksum (order-sensitive Horner fold over the delta codes)
    * and varint_bytes (encoded posting size). */
  def build(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), w -> length(w) > 0)")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum("tf").as("cf"),
        sort_array(collect_list(col("doc_id"))).as("ds"))
      .withColumn("gaps", expr(
        """transform(sequence(1, size(ds)),
          |  j -> CASE WHEN j = 1 THEN element_at(ds, 1) + 1L
          |            ELSE element_at(ds, j) - element_at(ds, j - 1) END)""".stripMargin))
      .select(col("term"), col("df"), col("cf"),
        expr("element_at(ds, 1)").cast("long").as("first_doc"),
        expr(s"aggregate(gaps, 0L, (a, g) -> (a * 1009 + g) % $P)").as("gap_checksum"),
        expr("aggregate(gaps, 0L, (a, g) -> a + (length(bin(g)) + 6) div 7)").as("varint_bytes"))
  }
}
