package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer
import graft.streaming.BpeStream
import graft.streaming.NearDupStream.DocText

/** Streaming BPE tokenization ([[BpeStream]]) — the online qx61: with
  * the merge table trained offline (the batch qx60 derivation), the
  * streamed per-doc token counts equal batch qx61 row for row across
  * micro-batch splits, and a replayed batch is idempotent. Pins the
  * typed greedy rewrite against the SQL fold spelling end to end. */
class BpeStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("streamed BPE token counts equal batch qx61 exactly across splits") {
    val expected = SparkEntry.queries("qx61_bpe_tokenize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty)

    val wf = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(expr("filter(split(text, ' '), w -> length(w) > 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val (merges, state) = BpeTrainer.train(wf, steps = 8)
    state.unpersist()
    val mergePairs = merges.map(m => (m.left, m.right))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => DocText(r.getLong(0), r.getString(1))).toSeq.sortBy(_.doc_id)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = BpeStream.tokenCounts(input.toDS(), mergePairs)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_bpe")).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      // Replay: a re-sent batch re-emits identical rows (stateless map —
      // dedup by doc_id downstream sees no change).
      input.addData(docs.take(20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_stream")
      .select("doc_id", "n_words", "n_bpe_tokens").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"bpe divergence: only-stream=${(got -- expected).take(5)}, only-batch=${(expected -- got).take(5)}")
  }

  test("typed greedy rewrite matches the training fold on overlap runs") {
    // `aaa`/(a,a): the case where replace-all or a right fold diverges.
    assert(BpeStream.tokenize("aaa", Seq(("a", "a"))) == Seq("aa", "a", BpeStream.EndMark))
    assert(BpeStream.tokenize("aaaa", Seq(("a", "a"))) == Seq("aa", "aa", BpeStream.EndMark))
    // Hierarchy: a learned symbol participates in a later merge.
    assert(BpeStream.tokenize("est", Seq(("e", "s"), ("es", "t"), ("est", BpeStream.EndMark)))
      == Seq("est" + BpeStream.EndMark))
  }
}
