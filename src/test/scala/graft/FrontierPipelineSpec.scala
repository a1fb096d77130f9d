package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{RobotsGateStream, UrlFrontierStream}
import graft.streaming.RobotsGateStream.UrlEvent
import graft.streaming.UrlFrontierStream.UrlDoc

/** The COMPOSED online crawl frontier: canonicalized URLs → seen-before
  * state ([[UrlFrontierStream]]) → robots politeness
  * ([[RobotsGateStream]]) in ONE streaming query — the crawler's full
  * front door. Admission set pinned against a plain-Scala derivation
  * (first arrival per canonical URL ∩ robots-allowed) across
  * micro-batch splits. */
class FrontierPipelineSpec extends SparkTestBase {

  private val robots = Map(
    "a.example" -> "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
    "b.example" -> "User-agent: *\nDisallow: /\nAllow: /pub/\n")

  // plain function values: the streaming map closure must not capture
  // the (non-serializable) suite instance
  private val host: String => String = c => c.split('/')(2)
  private val path: String => String = c => c.substring(c.indexOf('/', 7))

  test("frontier + robots compose in one query; admissions match plain Scala") {
    // 3 distinct URLs on a.example (one disallowed), 2 on b.example
    // (one allowed by the /pub/ override), with re-discoveries.
    val feed = Seq(
      UrlDoc("http://a.example/p/1", 1L),
      UrlDoc("http://a.example/p/1", 2L), // dup: frontier drops
      UrlDoc("http://a.example/private/x", 3L), // robots drops
      UrlDoc("http://b.example/pub/ok", 4L),
      UrlDoc("http://b.example/blocked", 5L), // robots drops
      UrlDoc("http://a.example/p/2", 6L),
      UrlDoc("http://a.example/p/2", 7L), // dup
      UrlDoc("http://b.example/pub/ok", 8L)) // dup

    // plain-Scala truth: first arrival per canon, then robots verdict
    val firstPerCanon = feed.groupBy(_.canon).map { case (c, xs) =>
      xs.minBy(_.doc_id)
    }.toSet
    val expected = firstPerCanon.filter { u =>
      val r = graft.operators.RobotsTxt.parse(robots(host(u.canon)), "bot")
      graft.operators.RobotsTxt.evaluate(r, path(u.canon)).fetchable
    }.map(u => (u.canon, u.doc_id))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[UrlDoc]
    val input = MemoryStream[UrlDoc]
    val hostF = host; val pathF = path
    val admitted = UrlFrontierStream.verdicts(input.toDS())
      .filter(!_.is_dup)
      .map(v => UrlEvent(v.doc_id, hostF(v.canon), pathF(v.canon)))(
        Encoders.product[UrlEvent])
    val q = RobotsGateStream.verdicts(admitted, robots, ua = "bot")
      .writeStream.format("memory").queryName("front_door")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_fd")).start()
    try {
      feed.grouped(3).foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("front_door").collect()
      .filter(_.getBoolean(3))
      .map(r => (s"http://${r.getString(1)}${r.getString(2)}", r.getLong(0))).toSet
    assert(got == expected,
      s"front-door divergence: got=$got expected=$expected")
  }
}
