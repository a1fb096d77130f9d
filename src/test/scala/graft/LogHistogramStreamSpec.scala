package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.LogHistogramStream
import graft.streaming.LogHistogramStream.DocLen

/** Streaming log₂-histogram quantiles ([[LogHistogramStream]]) — the
  * online qx35: (1) fed the corpus in id order across ragged micro-batch
  * splits, the final snapshot per source equals the batch query exactly;
  * (2) re-delivered waves change neither counts nor estimates. */
class LogHistogramStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def lens(): Seq[DocLen] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"),
        expr("size(filter(split(text, ' '), w -> length(w) > 0))").cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .collect().map(r => DocLen(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.doc_id)

  private def batchRows(): Set[(String, Long, Long, Long, Long)] =
    SparkEntry.queries("qx35_log_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def latestSnapshots(table: String): Set[(String, Long, Long, Long, Long)] =
    spark.table(table)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_docs").desc)))
      .where(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("streamed snapshots equal batch qx35 across ragged splits") {
    val docs = lens()
    val expected = batchRows()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocLen]
    for ((splitN, name) <- Seq(3 -> "lh_s1", 7 -> "lh_s2")) {
      val input = MemoryStream[DocLen]
      val q = LogHistogramStream.histograms(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
      try {
        docs.grouped(docs.size / splitN + 1).foreach { w =>
          input.addData(w); q.processAllAvailable()
        }
      } finally q.stop()
      val got = latestSnapshots(name)
      assert(got == expected,
        s"$name divergence: only-stream=${got -- expected}, only-batch=${expected -- got}")
    }
  }

  test("re-delivered waves change nothing (cursor replay discipline)") {
    val docs = lens()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocLen]
    val input = MemoryStream[DocLen]
    val q = LogHistogramStream.histograms(input.toDS())
      .writeStream.format("memory").queryName("lh_replay")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_lh_replay")).start()
    try {
      val (w1, w2) = docs.splitAt(docs.size / 2)
      input.addData(w1); q.processAllAvailable()
      input.addData(w2); q.processAllAvailable()
      val before = latestSnapshots("lh_replay")
      input.addData(w1); q.processAllAvailable() // at-least-once re-delivery
      input.addData(w2); q.processAllAvailable()
      assert(latestSnapshots("lh_replay") == before,
        "replayed waves moved the histogram")
      assert(before == batchRows(), "post-replay snapshots diverge from batch")
    } finally q.stop()
  }
}
