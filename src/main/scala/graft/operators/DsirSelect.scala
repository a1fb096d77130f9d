package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR feature extraction (Xie et al., NeurIPS 2023) — the hashed
  * uni+bigram bag a data-selection pass scores documents with,
  * as a single partition-parallel kernel: per document, Horner word
  * hashes (a·31 + char mod 1000003 — the corpus-wide [[graft.queries
  * .ExtQueries]] WORD_HASHES arithmetic verbatim), bucketed unigrams
  * and consecutive-pair bigrams to [[B]] buckets, with the
  * target-membership flag riding along so the raw and target bucket
  * counts come out of ONE downstream aggregation.
  *
  * Kernel, not HOF chain (the CdcChunker/AhoCorasick lesson): the
  * declarative spelling re-evaluates the char-level hash lambda per
  * reference and the per-doc window/explode chain dominated qx91's
  * 100× probe (72 s → the kernel path's feature passes are seconds).
  * [[graft.DsirSelectSpec]] pins kernel == declarative bit-for-bit. */
object DsirSelect {

  val B = 8192L
  val P = 2147483647L

  /** One document's hashed feature-bucket multiset (uni + bi) — the
    * scan-local unit both the batch kernel and the streaming twin
    * ([[graft.streaming.DsirStream]]) hash with. */
  def bucketsOf(text: String): Array[Long] = {
    val words = if (text == null) Array.empty[String]
                else text.split(' ').filter(_.nonEmpty)
    val hs = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var a = 0L; var j = 0
      while (j < w.length) { a = (a * 31L + w.charAt(j).toInt) % 1000003L; j += 1 }
      hs(i) = a; i += 1
    }
    val n = hs.length
    val out = new Array[Long](n + math.max(0, n - 1))
    var u = 0
    while (u < n) { out(u) = hs(u) % B; u += 1 }
    var g = 0
    while (g < n - 1) {
      out(n + g) = ((hs(g) * 1009L + hs(g + 1)) % P) % B; g += 1
    }
    out
  }

  /** (doc_id, source, tgt, b) — one row per feature OCCURRENCE; qx91
    * folds on tgt, qx93 on source. */
  def featureRows(docs: DataFrame, targetSource: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, src, text) =>
          val tgt = if (src == targetSource) 1L else 0L
          bucketsOf(text).iterator.map(b => (id, src, tgt, b))
        }
      }.toDF("doc_id", "source", "tgt", "b")
  }

  /** The declarative (array-HOF) spelling, kept as the spec reference
    * the kernel is pinned against. */
  private[graft] def featureRowsDeclarative(docs: DataFrame,
                                            targetSource: String): DataFrame =
    docs.select(col("doc_id"), col("source"),
        expr("transform(filter(split(text, ' '), w -> length(w) > 0), " +
          "w -> aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003))").as("h"))
      .select(col("doc_id"), col("source"),
        when(col("source") === targetSource, 1L).otherwise(0L).as("tgt"),
        explode(expr(
          s"concat(transform(h, x -> x % ${B}L), " +
            s"CASE WHEN size(h) < 2 THEN array() " +
            s"ELSE transform(sequence(1, size(h) - 1), " +
            s"i -> ((element_at(h, i) * 1009 + element_at(h, i + 1)) % ${P}L) % ${B}L) END)"
        )).as("b"))
}
