package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DomainCapStream
import graft.streaming.DomainCapStream.DocDomain

/** Streaming per-domain cap ([[DomainCapStream]]) — the online qx62:
  * first-come admission equals the plain prefix derivation across
  * micro-batch splits with no-op replay, and routing the feed in the
  * batch gate's hash order reproduces batch qx62's kept set EXACTLY —
  * the documented first-come/hash-rank divergence closing under
  * production's ordered routing. */
class DomainCapStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val tlds = Array("com", "org", "net", "io")
  private def domainOf(id: Long): String = s"site${id % 40}." + tlds((id % 4).toInt)

  private def docIds(): Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  private def run(feed: Seq[DocDomain], waves: Int, name: String,
                  replay: Seq[DocDomain] = Nil): Set[(String, Long, Long, Boolean, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocDomain]
    val input = MemoryStream[DocDomain]
    val q = DomainCapStream.verdicts(input.toDS(), cap = 5)
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
      .toSet
  }

  test("first-come cap equals the prefix derivation across splits; replay is a no-op") {
    val ids = docIds()
    val feed = ids.map(id => DocDomain(domainOf(id), id))
    val expected = feed.groupBy(_.domain).flatMap { case (dom, ds) =>
      ds.sortBy(_.doc_id).zipWithIndex.map { case (d, i) =>
        val admit = i < 5
        (dom, d.doc_id, if (admit) i + 1L else -1L, admit, i + 1L)
      }
    }.toSet

    val got = run(feed, waves = 4, "cap_split", replay = feed.take(30))
    assert(got == expected,
      s"cap divergence: only-stream=${(got -- expected).take(5)}, only-plain=${(expected -- got).take(5)}")
    // The replayed wave added no rows: every verdict is unique per doc.
    assert(got.size == feed.size)
  }

  test("hash-order routing reproduces batch qx62's kept set exactly") {
    val ids = docIds()
    def h(id: Long): Long = (id * 1000003L + 12345L) % 2147483647L
    // Route the feed in the batch gate's (h, doc_id) rank order, cursor
    // key = h — production's ordered routing through the sampler key.
    val feed = ids.sortBy(h).map(id => DocDomain(domainOf(id), h(id)))
    val got = run(feed, waves = 3, "cap_hash")
    val admitted = got.filter(_._4).map(v => (v._1, v._2, v._3))
    val batch = SparkEntry.queries("qx62_domain_cap")(spark, dir)
      .collect().map(r => (r.getString(0), h(r.getLong(2)), r.getLong(1))).toSet
    assert(admitted == batch,
      s"hash-routed cap != batch qx62: only-stream=${(admitted -- batch).take(5)}, " +
        s"only-batch=${(batch -- admitted).take(5)}")
  }
}
