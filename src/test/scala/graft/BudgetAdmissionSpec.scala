package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.ExtQueries
import graft.sources.Tables
import graft.streaming.BudgetAdmission
import graft.streaming.BudgetAdmission.{Admitted, DocTok}

/** Streaming token-budget admission ([[BudgetAdmission]]) — the online
  * qx22 tail: fed the same quality-gated, dedup-surviving candidates in
  * sampling-hash order (split across arbitrary micro-batches), the
  * admission set equals batch qx22's rows exactly, and at-least-once
  * re-delivery admits nothing twice and shifts no budget. */
class BudgetAdmissionSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"
  private val Budget = 2000L

  /** The batch qx22 upstream, reconstructed: ≥30-token docs surviving
    * the qx20 duplicate-cluster kill-list, with the sampling hash. */
  private def candidates(): Seq[DocTok] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)").as("n_tokens"),
        expr("(doc_id * 1000003 + 12345) % 2147483647").as("h"))
      .where(col("n_tokens") >= 30)
      .join(ExtQueries.qx20(spark, dir), Seq("doc_id"), "left")
      .where(col("rep").isNull || col("rep") === col("doc_id"))
      .select("lang", "doc_id", "n_tokens", "h")
      .collect()
      .map(r => DocTok(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(d => (d.h, d.doc_id))

  private def batchRows(): Set[(String, Long, Long, Long)] =
    SparkEntry.queries("qx22_curation_pipeline")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("ordered feed across micro-batches equals batch qx22 exactly") {
    val docs = candidates()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocTok]
    val input = MemoryStream[DocTok]
    val q = BudgetAdmission.admissions(input.toDS(), Budget)
      .writeStream.format("memory").queryName("budget_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_budget")).start()
    try {
      docs.grouped(docs.size / 4 + 1).foreach { wave =>
        input.addData(wave); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("budget_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = batchRows()
    assert(batch.nonEmpty, "batch admits nothing — test is vacuous")
    // The budget must actually close some stratum, or the overflow rule
    // goes untested.
    assert(batch.size < candidates().size, "budget never overflowed — vacuous")
    assert(streamed == batch,
      s"online/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("re-delivered waves admit nothing twice and shift no budget") {
    val docs = candidates()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocTok]
    val input = MemoryStream[DocTok]
    val q = BudgetAdmission.admissions(input.toDS(), Budget)
      .writeStream.format("memory").queryName("budget_replay")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_budget_r")).start()
    val waves = docs.grouped(docs.size / 3 + 1).toSeq
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      input.addData(waves(1)); q.processAllAvailable() // replay an old wave
      input.addData(waves.last); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("budget_replay")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.size == rows.distinct.size, "replay produced a duplicate admission")
    assert(rows.toSet == batchRows(), "replay shifted the admission set")
  }
}
