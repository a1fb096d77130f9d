package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.LogisticGD
import graft.streaming.LogisticServeStream
import graft.streaming.NearDupStream.DocText

/** Streaming distilled-logistic gate ([[LogisticServeStream]]) — the
  * online qx103: weights trained offline by the in-plan GD, then a
  * document stream scored statelessly under them. Pins (1) the streamed
  * rows equal to the BATCH feature table scored under the same weights
  * (the bit-identity claim — features, margin, fast sigmoid, milli
  * quantization all re-derived from raw text in the typed loop), across
  * micro-batch splits and a replay; (2) the wordless-document reject
  * contract; (3) `passes` consistency with `verdicts`. */
class LogisticServeStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("streamed scores equal the batch features scored under the same weights") {
    val feat = queries.ExtQueries.logisticFeatures(spark, dir)
    val w = LogisticGD.train(feat, dims = 5, iters = 5, etaDen = 2L)
    val expected = LogisticGD.withScore(feat, w)
      .withColumn("score_milli", expr("CAST(floor(p * 1000.0D + 0.5D) AS BIGINT)"))
      .select("doc_id", "score_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) >= 500L)).toSet

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => DocText(r.getLong(0), r.getString(1))).toSeq.sortBy(_.doc_id)

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = LogisticServeStream.verdicts(input.toDS(), w)
      .writeStream.format("memory").queryName("logistic_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_ls")).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // stateless: a replayed slice re-emits identical rows
      input.addData(docs.take(20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("logistic_stream").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // every doc with words must match the batch row exactly
    assert(got.filter(t => expected.exists(_._1 == t._1)) == expected,
      s"divergence: only-stream=${(got -- expected).take(5)}, only-batch=${(expected -- got).take(5)}")
  }

  test("a wordless document is rejected with score 0, and passes == verdicts") {
    val w = Array(0L, 0L, 0L, 0L, 0L)
    assert(LogisticServeStream.features("   ").isEmpty)
    assert(!LogisticServeStream.passes("   ", w))
    // zero weights => z = 0 => p = 0.5 => score 500 => keep
    assert(LogisticServeStream.passes("hello world", w))
    assert(LogisticServeStream.scoreMilli(
      LogisticServeStream.features("hello world").get, w) === 500L)
  }
}
