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

  /** Segment-and-merge posting build — the Lucene shape [[build]]'s
    * scaladoc declares, shipped: docs split into doc_id-range segments
    * of `segDocs` documents; each segment delta-encodes its postings
    * with the SAME varint arithmetic (the per-segment encoder), then
    * per term the SEGMENT SUMMARIES merge in segment order. The output
    * is bit-identical to [[build]] ([[InvertedIndexSpec]] pins it, the
    * qx86 oracle hashes it): the boundary code between segments is
    * first_doc(seg_k) − last_doc(seg_{k−1}) — exactly the gap the
    * single list would have had there — and the order-sensitive Horner
    * checksum composes exactly because
    * fold(a0, seq) = a0·1009^len + fold(0, seq)  (mod P),
    * so each segment carries fold(0, tail), 1009^(len−1) and its
    * boundary facts (first/last docid, m, cf) and the merge is a pure
    * per-term fold over ≤ ⌈n/segDocs⌉ TINY structs.
    *
    * Memory bound (the 100 TB point): stage 1 holds one segment's
    * postings for one term (≤ segDocs docids — bounded by the SEGMENT,
    * not by df); stage 2 holds one term's segment summaries (≤ #segs
    * × ~48 bytes). A stop-word with df ≈ n costs ⌈n/segDocs⌉ summary
    * rows instead of an n-length sorted array on a single task. */
  def buildSegmented(docs: DataFrame, segDocs: Long = 65536L): DataFrame = {
    require(segDocs > 0L, s"segDocs must be positive, got $segDocs")
    val tf = docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), w -> length(w) > 0)")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn("seg", expr(s"doc_id div ${segDocs}L"))
    // Per (term, segment): tail codes (positions 2..m — the gaps that
    // do not depend on what precedes the segment) fold into fold(0,
    // tail), its varint bytes, and 1009^(m−1); the first position is
    // deferred to the merge. sequence(2, 1) would run DESCENDING in
    // Spark, hence the size guard.
    val segs = tf.groupBy("term", "seg")
      .agg(count(lit(1)).as("m"), sum("tf").as("cfs"),
        sort_array(collect_list(col("doc_id"))).as("ds"))
      .withColumn("tg", expr(
        """CASE WHEN size(ds) < 2 THEN array()
          |     ELSE transform(sequence(2, size(ds)),
          |            j -> element_at(ds, j) - element_at(ds, j - 1)) END""".stripMargin))
      .select(col("term"), struct(
        col("seg"),
        expr("element_at(ds, 1)").as("fs"),
        expr("element_at(ds, size(ds))").as("ls"),
        col("m"), col("cfs"),
        expr(s"""aggregate(tg, named_struct('c', 0L, 'p', 1L),
                 |  (a, g) -> named_struct('c', (a.c * 1009 + g) % ${P}L,
                 |                         'p', (a.p * 1009) % ${P}L)).c""".stripMargin).as("tc"),
        expr(s"""aggregate(tg, 1L, (a, g) -> (a * 1009) % ${P}L)""").as("pm1"),
        expr("aggregate(tg, 0L, (a, g) -> a + (length(bin(g)) + 6) div 7)").as("tb")
      ).as("s"))
    // Per term: merge segment summaries in segment order. fd = −1 is
    // the not-started sentinel (docids are ≥ 0); the boundary code is
    // first_doc+1 for the globally first segment, fs − prev_last after.
    segs.groupBy("term")
      .agg(sort_array(collect_list(col("s"))).as("ss"))
      .withColumn("acc", expr(
        s"""aggregate(ss,
           |  named_struct('ck', 0L, 'by', 0L, 'df', 0L, 'cf', 0L, 'fd', -1L, 'pl', 0L),
           |  (a, s) -> named_struct(
           |    'ck', ((a.ck * ((s.pm1 * 1009) % ${P}L)) % ${P}L
           |           + (((CASE WHEN a.fd < 0L THEN s.fs + 1L
           |                     ELSE s.fs - a.pl END) % ${P}L) * s.pm1) % ${P}L
           |           + s.tc) % ${P}L,
           |    'by', a.by + (length(bin(CASE WHEN a.fd < 0L THEN s.fs + 1L
           |                                  ELSE s.fs - a.pl END)) + 6) div 7 + s.tb,
           |    'df', a.df + s.m,
           |    'cf', a.cf + s.cfs,
           |    'fd', CASE WHEN a.fd < 0L THEN s.fs ELSE a.fd END,
           |    'pl', s.ls))""".stripMargin))
      .select(col("term"), col("acc.df").as("df"), col("acc.cf").as("cf"),
        col("acc.fd").as("first_doc"), col("acc.ck").as("gap_checksum"),
        col("acc.by").as("varint_bytes"))
  }
}
