package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.ExtQueries
import graft.sources.Tables
import graft.streaming.PrioritySampleStream
import graft.streaming.PrioritySampleStream.{DocObs, SampleRow}

/** Streaming priority sampling ([[PrioritySampleStream]]) — the online
  * qx81: the sample after any micro-batch split of the corpus equals
  * the batch gate row-for-row, and a reversed + duplicated feed (replay
  * under at-least-once delivery) produces the identical sample. */
class PrioritySampleStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val K = 64

  private def corpus(): Seq[DocObs] =
    Tables.documents(spark, dir).select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => DocObs(r.getLong(0), r.getLong(1))).toSeq

  private def run(name: String, waves: Seq[Seq[DocObs]]): Seq[SampleRow] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocObs]
    val input = MemoryStream[DocObs]
    val q = PrioritySampleStream.sample(input.toDS(), K)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    val all = spark.table(name).collect()
      .map(r => SampleRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // Latest snapshot = rows at max n_seen; two consecutive batches that
    // accept no new ids emit byte-identical snapshots at the same stamp
    // (idempotent duplicates in the update sink), so dedup.
    val top = all.map(_.n_seen).max
    all.filter(_.n_seen == top).distinct.sortBy(_.rk).toSeq
  }

  test("streamed sample equals batch qx81 after arbitrary splits") {
    val docs = corpus()
    val waves = Seq(docs.take(7), docs.slice(7, 200), docs.slice(200, 201),
      docs.drop(201))
    val got = run("ps_split", waves)

    val batch = ExtQueries.qx81(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.size == K + 1, s"snapshot must carry k sample rows + tau, got ${got.size}")
    val sample = got.take(K)
    assert(sample.map(r => (r.rk, r.doc_id, r.w)).toSeq ==
      batch.map(b => (b._1, b._2, b._3)).toSeq)
    // The tau row reproduces the batch estimator: est = max(w, tau).
    val tau = got.last.pri
    batch.zip(sample).foreach { case (b, s) =>
      assert(math.floor(s.pri * 1e6 + 0.5).toLong == b._4, s"pri at rk ${b._1}")
      assert(math.floor(math.max(s.w.toDouble, tau) * 1e6 + 0.5).toLong == b._5,
        s"estimator at rk ${b._1}")
    }
  }

  test("reversed + duplicated delivery yields the identical sample") {
    val docs = corpus()
    val forward = run("ps_fwd", Seq(docs))
    val chaos = run("ps_chaos",
      Seq(docs.reverse.take(100), docs.reverse, docs.take(300), docs))
    assert(forward.map(r => (r.rk, r.doc_id, r.w, r.pri)) ==
      chaos.map(r => (r.rk, r.doc_id, r.w, r.pri)))
  }
}
