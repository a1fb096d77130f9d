package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtQueries
import graft.sinks.CuratedWriter

/** The full training-data build, composed end to end: curate (quality →
  * dedup → budget, qx22) → chunk the ADMITTED docs (qx24's windows) →
  * pack into sequences (qx25's offsets) → write partitioned
  * (CuratedWriter). Each stage is gate- or spec-proven alone; this spec
  * proves they COMPOSE — schemas line up, the admitted set threads
  * through, token accounting is conserved, and the written artifact
  * round-trips. */
class PipelineIntegrationSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("curate -> chunk -> pack -> write composes with conserved accounting") {
    val admitted = ExtQueries.qx22(spark, dir)
    val nAdmitted = admitted.count()
    assert(nAdmitted > 0, "curation admitted nothing — vacuous")

    // Chunk ONLY the admitted docs (semi-join the chunker's output).
    val chunks = ExtQueries.qx24(spark, dir)
      .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
    // Every admitted doc (>= 30 tokens, so >= 1 chunk) must chunk.
    assert(chunks.select("doc_id").distinct().count() == nAdmitted,
      "some admitted doc produced no chunks")
    // Chunk overlap accounting: stride 48 of width 64 means each doc's
    // chunk tokens sum to n + 16·(chunks − 1) (the overlap re-count).
    val accounting = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("chunk_tokens"), count(lit(1)).as("n_chunks"))
      .join(admitted.select("doc_id", "n_tokens"), "doc_id")
      .where(col("chunk_tokens") =!= col("n_tokens") + lit(16L) * (col("n_chunks") - 1))
    assert(accounting.isEmpty, s"overlap accounting broken: ${accounting.head(3).toSeq}")

    // Pack the admitted chunks per language in (doc_id, chunk_id) order.
    val seqLen = 256L
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id", "chunk_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val packed = chunks.join(admitted.select("doc_id", "lang"), "doc_id")
      .withColumn("off", coalesce(sum("n_tokens").over(byLang), lit(0L)))
      .withColumn("seq_id", expr(s"off div $seqLen"))
    // Conservation: packed tokens == chunk tokens, per language.
    val perLang = packed.groupBy("lang").agg(sum("n_tokens").as("packed"))
      .join(chunks.join(admitted.select("doc_id", "lang"), "doc_id")
        .groupBy("lang").agg(sum("n_tokens").as("chunked")), "lang")
      .where(col("packed") =!= col("chunked"))
    assert(perLang.isEmpty, "packing lost or duplicated tokens")
    // Sequences fill monotonically: every non-final sequence of a lang
    // starts within seqLen of the previous one's start offset.
    assert(packed.groupBy("lang", "seq_id").count().count() ==
      packed.select("lang", "seq_id").distinct().count())

    // Write + round-trip the packed artifact, partitioned by lang.
    val out = tmpDir("pipeline_out")
    CuratedWriter.writeCurated(
      packed.select("lang", "doc_id", "chunk_id", "seq_id", "n_tokens"), out)
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    assert(back.select(sum("n_tokens")).head().getLong(0) ==
      packed.select(sum("n_tokens")).head().getLong(0))
  }
}
