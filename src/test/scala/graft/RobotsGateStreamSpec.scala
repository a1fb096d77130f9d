package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.RobotsGateStream
import graft.streaming.RobotsGateStream.UrlEvent

/** Streaming robots gate ([[RobotsGateStream]]) — the online qx72:
  * with the robots snapshot built in PLAIN SCALA (an independent
  * spelling of the qx72 generator), the streamed verdict grid equals
  * the batch gate exactly across micro-batch splits and replay, and an
  * unknown domain is allow-all. */
class RobotsGateStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private val tlds = Vector("com", "org", "net", "io")

  /** The qx72 robots generator, re-spelled in plain string code. */
  private def robotsFor(u: Long): (String, String) = {
    val domain = s"site$u.${tlds((u % 4).toInt)}"
    val delay = s"rawl-delay: ${u % 7 + 1}\n"
    val content = new StringBuilder
    content ++= s"# robots for $domain\nSitemap: https://$domain/sitemap.xml\n\n"
    content ++= "User-agent: other-bot\nDisallow: /\n\n"
    if (u % 3 == 0) {
      content ++= s"user-agent: smelter\nc$delay"
      content ++= "disallow: /private/\nallow: /private/pub/\n"
      if (u % 4 == 0) content ++= "disallow: /*.tmp$\n"
      content ++= "\nUser-agent: *\nDisallow: /\n"
    } else {
      content ++= s"User-Agent: *\nC$delay"
      content ++= "Disallow: /private/\nAllow: /private/pub/\n"
      if (u % 4 == 0) content ++= "Disallow: /*.tmp$\n"
    }
    (domain, content.toString)
  }

  private def pathFor(d: Long): String = (d % 7) match {
    case 0 => s"/private/x/$d"
    case 1 => s"/private/pub/$d"
    case 2 => s"/tmp/$d.tmp"
    case _ => s"/p/$d"
  }

  test("streamed verdict grid equals batch qx72 across splits and replay") {
    val batch = SparkEntry.queries("qx72_robots_filter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5))).toSet

    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val robots = ids.map(_ % 40).distinct.map(robotsFor).toMap
    val feed = ids.map(d => UrlEvent(d, robotsFor(d % 40)._1, pathFor(d)))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[UrlEvent]
    val input = MemoryStream[UrlEvent]
    val q = RobotsGateStream.verdicts(input.toDS(), robots, ua = "Smelter")
      .writeStream.format("memory").queryName("robots_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_rg")).start()
    try {
      feed.grouped(feed.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(feed.take(20)); q.processAllAvailable() // replay: stateless
    } finally q.stop()

    val got = spark.table("robots_stream").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == batch,
      s"robots divergence: only-stream=${(got -- batch).take(3)}, only-batch=${(batch -- got).take(3)}")
  }

  test("a domain without a robots file is allow-all with zero delay") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[UrlEvent]
    val input = MemoryStream[UrlEvent]
    val q = RobotsGateStream.verdicts(input.toDS(), Map.empty, ua = "x")
      .writeStream.format("memory").queryName("robots_nofile")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_rg2")).start()
    try { input.addData(Seq(UrlEvent(1L, "nowhere.example", "/private/x"))); q.processAllAvailable() }
    finally q.stop()
    val r = spark.table("robots_nofile").collect().head
    assert(r.getBoolean(3) && r.getLong(4) === 0L && r.getLong(5) === 0L)
  }
}
