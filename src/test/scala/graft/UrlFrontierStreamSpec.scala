package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.UrlFrontierStream
import graft.streaming.UrlFrontierStream.UrlDoc

/** Streaming URL frontier ([[UrlFrontierStream]]) — the online qx65:
  * fed the batch gate's own canonicalized rows in doc_id order, the
  * frontier's final per-URL (keeper, count) grid equals batch qx65
  * exactly across micro-batch splits, the admitted set is exactly one
  * fetch per canonical URL, and replay is a no-op. */
class UrlFrontierStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** The batch gate's planted feed: (canon, doc_id) in doc_id order —
    * one definition of the canonicalization (ExtQueries.urlCanon). */
  private def feed(): Seq[UrlDoc] =
    graft.queries.ExtQueries.urlCanon(spark, dir)
      .select("canon", "doc_id").collect()
      .map(r => UrlDoc(r.getString(0), r.getLong(1)))
      .sortBy(_.doc_id).toSeq

  private def run(feed: Seq[UrlDoc], waves: Int, name: String,
                  replay: Seq[UrlDoc] = Nil): Seq[(String, Long, Long, Boolean, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[UrlDoc]
    val input = MemoryStream[UrlDoc]
    val q = UrlFrontierStream.verdicts(input.toDS())
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
    try {
      feed.grouped(feed.size / waves + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      if (replay.nonEmpty) { input.addData(replay); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
      .toSeq
  }

  test("final frontier grid equals batch qx65 across splits; one fetch per URL; replay no-op") {
    val f = feed()
    val got = run(f, waves = 4, "frontier_split", replay = f.take(40))

    // Replay added nothing: one verdict per feed row.
    assert(got.size == f.size)

    // Exactly one admission (is_dup = false) per canonical URL, and it
    // is the keeper itself.
    val admitted = got.filter(!_._4)
    assert(admitted.map(_._1).distinct.size == admitted.size)
    assert(admitted.forall(v => v._2 == v._3))

    // Final per-URL (keeper, n) == batch qx65 (keeper_id, n_docs).
    val finalGrid = got.groupBy(_._1).map { case (canon, vs) =>
      val last = vs.maxBy(_._5)
      (canon, last._3, last._5)
    }.toSet
    val batch = SparkEntry.queries("qx65_url_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1))).toSet
    assert(finalGrid == batch,
      s"frontier != batch qx65: only-stream=${(finalGrid -- batch).take(5)}, " +
        s"only-batch=${(batch -- finalGrid).take(5)}")

    // Every duplicate points at the batch keeper.
    val keeperOf = batch.map(b => b._1 -> b._2).toMap
    assert(got.forall(v => v._3 == keeperOf(v._1)))
  }
}
