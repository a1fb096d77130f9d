package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CdcChunker
import graft.streaming.ChunkDedupStream
import graft.streaming.ChunkDedupStream.ChunkObs

/** Streaming chunk-store admission ([[ChunkDedupStream]]) — the online
  * qx85: chunk verdicts folded per source equal the batch accounting
  * exactly, across micro-batch splits and replay. */
class ChunkDedupStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("streamed store fold equals batch qx85 across splits and replay") {
    val batch = SparkEntry.queries("qx85_cdc_chunks")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val obs = CdcChunker.chunks(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text")))
      .collect()
      .map(r => ChunkObs(r.getAs[String]("source"), r.getAs[Long]("ch1"),
        r.getAs[Long]("ch2"), r.getAs[Long]("len"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("start")))
      .toSeq.sortBy(o => (o.doc_id, o.start))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[ChunkObs]
    val input = MemoryStream[ChunkObs]
    val ckpt = tmpDir("ckpt_cd")
    val q = ChunkDedupStream.admit(input.toDS())
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      obs.grouped(obs.size / 5 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(obs.take(200)); q.processAllAvailable() // replay
    } finally q.stop()

    val verdicts = spark.table("chunk_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    // replay emitted nothing new: one verdict per (doc, start)
    assert(verdicts.groupBy(v => (v._2, v._3)).forall(_._2.length == 1),
      "replayed occurrences must not re-emit")
    val got = verdicts.groupBy(_._1).map { case (src, vs) =>
      src -> (vs.length.toLong, vs.count(_._6).toLong,
        vs.map(_._4).sum, vs.filter(_._5).map(_._4).sum)
    }
    assert(got == batch,
      s"online accounting diverged from batch qx85:\n got=$got\n want=$batch")

    // Observability (r9 ADVICE): every sub-cursor arrival — the 200
    // replayed occurrences here, but an unordered-intake violation
    // lands in the same counter — is COUNTED in state and readable
    // back as an audit metric, so divergence from batch accounting is
    // detectable rather than silent.
    val sub = ChunkDedupStream.subCursorAudit(spark, ckpt)
    assert(sub == 200L, s"expected 200 sub-cursor arrivals counted, got $sub")
  }

  test("global reconciled store fold equals batch qx90 across splits and replay") {
    val batch = SparkEntry.queries("qx90_chunk_reconcile")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

    val obs = CdcChunker.chunks(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text")))
      .collect()
      .map(r => ChunkObs(r.getAs[String]("source"), r.getAs[Long]("ch1"),
        r.getAs[Long]("ch2"), r.getAs[Long]("len"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("start")))
      .toSeq.sortBy(o => (o.doc_id, o.start))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[ChunkObs]
    val input = MemoryStream[ChunkObs]
    val q = ChunkDedupStream.admitGlobal(input.toDS())
      .writeStream.format("memory").queryName("gchunk_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_gcd")).start()
    try {
      obs.grouped(obs.size / 7 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(obs.take(150)); q.processAllAvailable() // replay
    } finally q.stop()

    val P = CdcChunker.P
    val vs = spark.table("gchunk_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getString(6)))
    assert(vs.groupBy(v => (v._2, v._3)).forall(_._2.length == 1),
      "replayed occurrences must not re-emit")
    // A first-sight verdict's owner is itself; cross-dups name another
    // source's store as the one holding the chunk.
    assert(vs.filter(_._6).forall(v => v._7 == v._1), "first sight owns")
    val got = vs.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong,
        xs.count(_._6).toLong,
        xs.filter(_._6).map(_._4).sum,
        xs.filterNot(_._6).map(_._4).sum,
        xs.filter(v => !v._6 && v._7 != v._1).map(_._4).sum,
        xs.filter(_._6).map(v => (v._5 * 1009L + v._4) % P).sum)
    }
    assert(got == batch,
      s"online reconciled accounting diverged from batch qx90:\n got=$got\n want=$batch")
    assert(vs.exists(v => !v._6 && v._7 != v._1),
      "fixture must exercise a cross-source duplicate")
  }

  test("the standing store counts duplicate arrivals per identity, first wins") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[ChunkObs]
    val a = ChunkObs("s", 7L, 9L, 64L, 1L, 1L)
    val b = ChunkObs("s", 7L, 9L, 64L, 2L, 10L) // same identity, later doc
    val c = ChunkObs("s", 8L, 9L, 64L, 2L, 80L) // different identity
    val input = MemoryStream[ChunkObs]
    val q = ChunkDedupStream.admit(input.toDS())
      .writeStream.format("memory").queryName("chunk_stream2")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_cd2")).start()
    try {
      input.addData(Seq(a)); q.processAllAvailable()
      input.addData(Seq(b, c)); q.processAllAvailable()
      input.addData(Seq(a)); q.processAllAvailable() // sub-cursor re-delivery
    } finally q.stop()
    val rows = spark.table("chunk_stream2").collect()
      .map(r => (r.getLong(1), r.getBoolean(4), r.getBoolean(5))).toSet
    assert(rows == Set((1L, false, true), (2L, true, false), (2L, false, true)))
  }
}
