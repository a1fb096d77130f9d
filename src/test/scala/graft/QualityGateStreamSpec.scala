package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.QualityGateStream
import graft.streaming.NearDupStream.DocText

/** Streaming quality gate ([[QualityGateStream]]) — the online qx63:
  * with the lexicon model trained offline, the streamed per-doc
  * verdicts equal an INDEPENDENT plain-Scala derivation of the same
  * integer arithmetic across micro-batch splits, and the rollup of the
  * streamed verdicts reproduces the batch gate's per-source grid —
  * pinning the typed scoring loop against the SQL join spelling. */
class QualityGateStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def loadDocs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sortBy(_._1)

  /** The model derivation in plain Scala — no Spark, no SQL: the
    * third independent spelling of the training arithmetic. */
  private def trainPlain(docs: Seq[(Long, String, String)]): (Map[String, (Long, Long)], Long) = {
    val words = docs.flatMap { case (_, text, source) =>
      val pos = source.drop(3).toLong % 4 == 0
      text.split(" ").filter(_.nonEmpty).map(w => (w, pos))
    }
    val model = words.groupBy(_._1).map { case (w, ws) =>
      val cp = ws.count(_._2).toLong
      (w, (cp, ws.length.toLong - cp))
    }
    val tPos = model.valuesIterator.map(_._1).sum
    val tNeg = model.valuesIterator.map(_._2).sum
    val v = model.size.toLong
    (model, 10000L * (tPos + v) / (tNeg + v))
  }

  test("streamed verdicts equal the plain-Scala derivation across splits") {
    val docs = loadDocs()
    val (model, r) = trainPlain(docs)
    val expected = docs.map { case (id, text, _) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val score = ws.map { w =>
        val (cp, cn) = model.getOrElse(w, (0L, 0L))
        QualityGateStream.wordScore(cp, cn)
      }.sum
      (id, ws.length.toLong, score, score > ws.length * r)
    }.toSet

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val feed = docs.map { case (id, text, _) => DocText(id, text) }
    val q = QualityGateStream.verdicts(input.toDS(), model, r)
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_qg")).start()
    try {
      feed.grouped(feed.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      // Replay: stateless map — re-sent docs re-emit identical rows.
      input.addData(feed.take(15)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quality_stream").distinct().collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getBoolean(3))).toSet
    assert(got == expected,
      s"quality divergence: only-stream=${(got -- expected).take(5)}, only-plain=${(expected -- got).take(5)}")
  }

  test("streamed verdict rollup reproduces the batch gate's per-source grid") {
    val docs = loadDocs()
    val (model, r) = trainPlain(docs)
    val bySource = docs.groupBy(_._3)
    val rolled = bySource.map { case (source, ds) =>
      val verdicts = ds.map { case (id, text, _) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val score = ws.map { w =>
          val (cp, cn) = model.getOrElse(w, (0L, 0L))
          QualityGateStream.wordScore(cp, cn)
        }.sum
        (ws.length.toLong, score, score > ws.length * r)
      }
      (source, (ds.size.toLong, verdicts.count(_._3).toLong,
        verdicts.map(_._1).sum, verdicts.map(_._2).sum))
    }
    val batch = SparkEntry.queries("qx63_quality_classifier")(spark, dir)
      .collect().map(r0 => (r0.getString(0),
        (r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getLong(4)))).toMap
    assert(batch == rolled,
      s"rollup divergence: ${batch.keySet.union(rolled.keySet).filter(k => batch.get(k) != rolled.get(k)).take(3)}")
  }
}
