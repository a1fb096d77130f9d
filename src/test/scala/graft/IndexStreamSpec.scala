package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IndexStream
import graft.streaming.IndexStream.TermObs

/** Streaming inverted-index maintenance ([[IndexStream]]) — the online
  * qx86: after any doc-ordered prefix the standing summaries equal the
  * batch segment-and-merge build, across micro-batch splits and
  * replay, because a micro-batch IS a segment under the composition
  * algebra InvertedIndexSpec proves. */
class IndexStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("streamed summaries equal batch qx86 across splits and replay") {
    val batch = SparkEntry.queries("qx86_inverted_index")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val obs = docs.flatMap { case (id, t) => IndexStream.postings(id, t) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[TermObs]
    val input = MemoryStream[TermObs]
    val q = IndexStream.maintain(input.toDS())
      .writeStream.format("memory").queryName("idx_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_idx")).start()
    try {
      obs.grouped(obs.size / 6 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(obs.take(100)); q.processAllAvailable() // replay
    } finally q.stop()

    // df is monotone, so the final summary per term is its max-df row.
    val got = spark.table("idx_stream").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).maxBy(_._1) }
    assert(got == batch,
      s"online index diverged from the batch build: " +
        s"only-stream=${(got.toSet -- batch.toSet).take(3)} " +
        s"only-batch=${(batch.toSet -- got.toSet).take(3)}")
  }

  test("re-delivery below the cursor is skipped and counted, never re-encoded") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[TermObs]
    val input = MemoryStream[TermObs]
    val ckpt = tmpDir("ckpt_idx2")
    val q = IndexStream.maintain(input.toDS())
      .writeStream.format("memory").queryName("idx_stream2")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq(TermObs("t", 3L, 2L), TermObs("t", 17L, 1L)))
      q.processAllAvailable()
      input.addData(Seq(TermObs("t", 3L, 2L), TermObs("t", 400L, 5L)))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("idx_stream2").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .maxBy(_._1)
    // codes: 4 (doc 3 first), 14, 383 → checksum and varints by hand
    val ck = Seq(4L, 14L, 383L).foldLeft(0L)((a, g) => (a * 1009 + g) % IndexStream.P)
    assert(fin == ((3L, 8L, 3L, ck, 1L + 1L + 2L)),
      s"got $fin — the replayed doc 3 must not re-encode")
    // the skipped re-delivery is observable in state
    val sub = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "idx").load()
      .selectExpr("value.subCursor AS s").collect().map(_.getLong(0)).sum
    assert(sub == 1L, s"expected 1 counted sub-cursor arrival, got $sub")
  }
}
