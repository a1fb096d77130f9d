package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.ExtQueries
import graft.sources.Tables
import graft.streaming.PackingStream
import graft.streaming.PackingStream.ChunkTok

/** Streaming sequence packing ([[PackingStream]]) — the online qx25:
  * fed the corpus's chunks in (doc_id, chunk_id) order across arbitrary
  * micro-batches, the per-sequence occupancy equals batch qx25 exactly,
  * and replayed waves assign nothing twice and shift no offset. */
class PackingStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"
  private val SeqLen = 256L

  private def chunkFeed(): Seq[ChunkTok] =
    ExtQueries.qx24(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .select("source", "doc_id", "chunk_id", "n_tokens")
      .collect()
      .map(r => ChunkTok(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(c => (c.doc_id, c.chunk_id))

  private def batchOccupancy(): Set[(String, Long, Long, Long)] =
    SparkEntry.queries("qx25_seq_packing")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def run(waves: Seq[Seq[ChunkTok]], name: String,
                  replayWave: Option[Int] = None): Set[(String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[ChunkTok]
    val input = MemoryStream[ChunkTok]
    val q = PackingStream.assignments(input.toDS(), SeqLen)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      replayWave.foreach { i => input.addData(waves(i)); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == rows.distinct.length, "duplicate assignment reached the sink")
    // Aggregate assignments to qx25's per-sequence occupancy.
    spark.table(name)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("ordered chunk feed across micro-batches equals batch qx25 occupancy") {
    val feed = chunkFeed()
    val got = run(feed.grouped(feed.size / 4 + 1).toSeq, "packing_stream")
    val want = batchOccupancy()
    assert(want.exists(_._2 > 0), "corpus never fills a sequence — vacuous")
    assert(got == want,
      s"online/batch divergence: only-stream=${got -- want}, only-batch=${want -- got}")
  }

  test("replayed waves assign nothing twice and shift no offset") {
    val feed = chunkFeed()
    val got = run(feed.grouped(feed.size / 3 + 1).toSeq, "packing_replay", replayWave = Some(1))
    assert(got == batchOccupancy(), "replay shifted the packing")
  }
}
