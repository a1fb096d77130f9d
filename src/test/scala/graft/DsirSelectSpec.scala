package graft

import org.apache.spark.sql.functions._

import graft.operators.DsirSelect

/** [[DsirSelect]] (the qx91 engine): the feature kernel is pinned
  * bit-identical to the declarative HOF spelling on the real corpus,
  * and the selection semantics are sanity-proven — documents from the
  * target slice outscore the corpus on average (the importance weights
  * genuinely prefer target-like text). */
class DsirSelectSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("source"), col("text"))

  test("feature kernel == declarative spelling (occurrences, buckets, flags)") {
    def multiset(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("doc_id", "tgt", "b").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val kern = multiset(DsirSelect.featureRows(docs, "src0"))
    val ref = multiset(DsirSelect.featureRowsDeclarative(docs, "src0"))
    assert(kern == ref, "kernel features diverged from the declarative spelling")
  }

  test("target-slice documents outscore the rest under the importance weights") {
    val sel = SparkEntry.queries("qx91_dsir_select")(spark, dir)
    val rows = sel.collect()
    assert(rows.length == 64)
    // dsir scores of selected target docs vs selected non-target: the
    // weights must PREFER target-like text, which on this corpus means
    // the mean selected-target score exceeds the mean non-target score.
    val (tgt, rest) = rows.partition(_.getString(2) == "src0")
    assert(tgt.nonEmpty, "fixture must select some target docs")
    if (rest.nonEmpty) {
      val mt = tgt.map(_.getLong(3)).sum.toDouble / tgt.length
      val mr = rest.map(_.getLong(3)).sum.toDouble / rest.length
      assert(mt > mr, f"target mean $mt%.0f must exceed non-target mean $mr%.0f")
    }
    // priorities are the qx81 formula: monotone in the shifted score
    // for a fixed hash — spot-check ordering integrity
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 64L),
      "ranks must be the contiguous top-64")
  }
}
