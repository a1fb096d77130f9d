package graft

import java.io.File

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.CrawlDoor

/** Top-level so Spark builds the Encoder without an outer scope. */
case class CrawlBytes(doc_id: Long, warc: Array[Byte])

/** The LIVE crawl front door ([[CrawlDoor]], r8 verdict #5): crawl
  * bytes → WARC → robots → frontier → quality/dedup door as three
  * checkpointed stages over transactional handoffs, KILLED mid-feed
  * (all stages) and restarted — and the funnel summary equals batch
  * qx77's row EXACTLY (same media bytes, same shared scoring), with an
  * idle restart committing nothing. A second test makes the robots
  * stage load-bearing: a disallow snapshot excludes exactly its
  * domains' docs from the frontier handoff while the fetch census is
  * unchanged. */
class CrawlDoorSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def media(): Seq[CrawlBytes] =
    queries.ExtQueries.qx77Media(spark, dir)
      .collect().map(r => CrawlBytes(r.getLong(0), r.getAs[Array[Byte]](1)))
      .toSeq.sortBy(_.doc_id)

  private def startStages(base: String, input: MemoryStream[CrawlBytes],
                          robots: Map[String, String]): Seq[StreamingQuery] = {
    val q1 = CrawlDoor.unwrapStage(input.toDF(), robots, "graftbot",
      s"$base/staged", s"$base/ck1")
    val q2 = CrawlDoor.frontierStage(spark, s"$base/staged", s"$base/frontier",
      s"$base/ck2")
    val q3 = CrawlDoor.dedupStage(spark, s"$base/frontier", s"$base/manifest",
      s"$base/ck3")
    Seq(q1, q2, q3)
  }

  private def drain(qs: Seq[StreamingQuery]): Unit =
    qs.foreach(_.processAllAvailable())

  test("the live funnel equals batch qx77 across a kill/restart of all stages") {
    val base = tmpDir("crawl_door")
    val batchRow = SparkEntry.queries("qx77_wet_funnel")(spark, dir).collect().head
    val expect = (0 until 6).map(i => batchRow.getLong(i))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[CrawlBytes]
    val bytes = media()
    val (w1, w2) = bytes.splitAt(bytes.size / 2)

    // One MemoryStream across restarts (its offsets are the replayable
    // upstream; the IngestDoorRecoverySpec pattern).
    val input = MemoryStream[CrawlBytes]

    // Run 1: first wave, then kill every stage mid-pipeline.
    val qs1 = startStages(base, input, Map.empty)
    input.addData(w1)
    drain(qs1)
    qs1.foreach(_.stop())

    // Run 2: same checkpoints, remainder of the crawl.
    val qs2 = startStages(base, input, Map.empty)
    input.addData(w2)
    drain(qs2)
    qs2.foreach(_.stop())

    // Run 3: idle restart commits nothing new at any seam.
    def committed(): Set[String] =
      Seq("staged", "frontier", "manifest").flatMap { s =>
        val d = new File(s"$base/$s")
        if (d.exists()) d.listFiles().map(f => s"$s/${f.getName}") else Array.empty[String]
      }.toSet
    val after2 = committed()
    val qs3 = startStages(base, input, Map.empty)
    drain(qs3)
    qs3.foreach(_.stop())
    assert(committed() == after2, "idle restart committed new batches")

    val got = CrawlDoor.counts(spark, s"$base/staged", s"$base/manifest")
      .collect().head
    val gotSeq = (0 until 6).map(i => got.getLong(i))
    assert(gotSeq == expect, s"funnel diverged: stream=$gotSeq batch=$expect")
  }

  test("the door runs off the FileBus replayable transport: bus-fed == batch qx77") {
    val base = tmpDir("crawl_bus")
    val busRoot = tmpDir("crawl_bus_log")
    val topic = "crawl"
    val batchRow = SparkEntry.queries("qx77_wet_funnel")(spark, dir).collect().head
    val expect = (0 until 6).map(i => batchRow.getLong(i))

    val bytes = media()
    val enc64 = java.util.Base64.getEncoder
    // producer: doc_id-ordered waves, keyed routing across 2 partitions
    def produce(wave: Seq[CrawlBytes], tag: String): Unit =
      wave.groupBy(b => (b.doc_id % 2).toInt).foreach { case (p, recs) =>
        graft.sources.FileBus.append(busRoot, topic, p,
          recs.sortBy(_.doc_id).map(b => graft.sources.FileBus.Record(
            b.doc_id.toString, enc64.encodeToString(b.warc), b.doc_id)),
          Some(tag))
      }

    val q1 = CrawlDoor.unwrapStage(
      CrawlDoor.busCrawlSource(spark, busRoot, topic), Map.empty, "graftbot",
      s"$base/staged", s"$base/ck1")
    val q2 = CrawlDoor.frontierStage(spark, s"$base/staged", s"$base/frontier", s"$base/ck2")
    val q3 = CrawlDoor.dedupStage(spark, s"$base/frontier", s"$base/manifest", s"$base/ck3")
    try {
      bytes.grouped(bytes.size / 3 + 1).zipWithIndex.foreach { case (w, i) =>
        produce(w, s"w$i")
        q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      }
    } finally { q1.stop(); q2.stop(); q3.stop() }

    val got = CrawlDoor.counts(spark, s"$base/staged", s"$base/manifest")
      .collect().head
    assert((0 until 6).map(got.getLong) == expect,
      s"bus-fed funnel diverged: ${(0 until 6).map(got.getLong)} vs $expect")
  }

  test("the paced door consumes crawl-delay: funnel exact and cadence >= delay across kill/restart") {
    val base = tmpDir("crawl_door_pace")
    // Allow everything, but throttle two real domains.
    val robots = Map(
      "m1.example" -> "User-agent: *\nCrawl-delay: 2\n",
      "m2.example" -> "User-agent: *\nCrawl-delay: 3\n")
    val batchRow = SparkEntry.queries("qx77_wet_funnel")(spark, dir).collect().head
    val expect = (0 until 6).map(i => batchRow.getLong(i))

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[CrawlBytes]
    val input = MemoryStream[CrawlBytes]
    def start4(): Seq[StreamingQuery] = Seq(
      CrawlDoor.unwrapStage(input.toDF(), robots, "graftbot", s"$base/staged", s"$base/ck1"),
      CrawlDoor.frontierStage(spark, s"$base/staged", s"$base/frontier", s"$base/ck2"),
      CrawlDoor.paceStage(spark, s"$base/frontier", s"$base/paced", s"$base/ckp"),
      CrawlDoor.dedupStage(spark, s"$base/paced", s"$base/manifest", s"$base/ck3"))

    // Watermark heartbeat: a far-future row on the reserved flush
    // domain, written straight into the frontier handoff glob — it
    // advances the pace stage's event clock and is never committed.
    def writeFlush(i: Int): Unit =
      CrawlDoor.writeHeartbeat(spark, s"$base/frontier", i)

    val bytes = media()
    val (w1, w2) = bytes.splitAt(bytes.size / 2)
    // Run 1: first wave, then kill ALL FOUR stages mid-pipeline.
    val qs1 = start4()
    input.addData(w1); drain(qs1); qs1.foreach(_.stop())
    // Run 2: same checkpoints (politeness buckets + pending resume).
    val qs2 = start4()
    input.addData(w2); drain(qs2)
    writeFlush(1); drain(qs2)
    writeFlush(2); drain(qs2)
    qs2.foreach(_.stop())

    // Funnel equality: pacing reorders in time, never drops or adds.
    val got = CrawlDoor.counts(spark, s"$base/staged", s"$base/manifest")
      .collect().head
    assert((0 until 6).map(got.getLong) == expect,
      s"paced funnel diverged: ${(0 until 6).map(got.getLong)} vs $expect")

    // The paced handoff: slots equal the batch token bucket over the
    // frontier rows, releases never precede slots, and consecutive
    // slots per throttled domain are spaced >= its crawl-delay.
    import org.apache.spark.sql.functions.col
    val frontier = spark.read.schema(CrawlDoor.stagedSchema)
      .parquet(s"$base/frontier/batch=*")
      .where(col("domain") =!= CrawlDoor.FlushDomain)
      .select("domain", "doc_id", "crawl_delay").collect()
      .map(r => graft.streaming.PolitenessStream.FetchCandidate(
        r.getString(0), r.getLong(1), (r.getLong(1) + 1L) * 1000L, r.getLong(2) * 1000L))
      .toSeq
    val expectSlots = graft.streaming.PolitenessStream.batchSchedule(frontier)
    val paced = spark.read.parquet(s"$base/paced/batch=*")
      .select("domain", "doc_id", "scheduled_ms", "released_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(paced.map(_._2).sorted.toSeq == frontier.map(_.doc_id).sorted,
      "paced handoff must release every frontier row exactly once")
    assert(paced.map(p => p._2 -> p._3).toMap == expectSlots,
      "slots diverged from the batch token bucket")
    assert(paced.forall(p => p._4 >= p._3), "a fetch released before its slot")
    for ((d, delaySec) <- Seq("m1.example" -> 2L, "m2.example" -> 3L)) {
      val slots = paced.filter(_._1 == d).map(_._3).sorted
      assert(slots.length >= 2, s"fixture must pace >= 2 fetches on $d")
      slots.zip(slots.tail).foreach { case (p, n) =>
        assert(n - p >= delaySec * 1000L, s"$d violated crawl-delay: $p -> $n")
      }
    }
  }

  test("the robots stage is load-bearing: disallowed domains never reach the frontier handoff") {
    val base = tmpDir("crawl_door_rb")
    // Disallow everything on m1.example and m2.example.
    val robots = Map(
      "m1.example" -> "User-agent: *\nDisallow: /\n",
      "m2.example" -> "User-agent: *\nDisallow: /\n")

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[CrawlBytes]
    val input = MemoryStream[CrawlBytes]
    val qs = startStages(base, input, robots)
    input.addData(media())
    drain(qs)
    qs.foreach(_.stop())

    val staged = spark.read.schema(CrawlDoor.stagedSchema)
      .parquet(s"$base/staged/batch=*")
    val frontier = spark.read.schema(CrawlDoor.stagedSchema)
      .parquet(s"$base/frontier/batch=*")
    val blockedStaged = staged
      .where(org.apache.spark.sql.functions.col("domain").isin("m1.example", "m2.example"))
      .count()
    assert(blockedStaged > 0, "fixture must fetch blocked-domain docs")
    // census keeps them; the frontier handoff excludes them
    val blockedThrough = frontier
      .where(org.apache.spark.sql.functions.col("domain").isin("m1.example", "m2.example"))
      .count()
    assert(blockedThrough == 0L, s"$blockedThrough disallowed docs passed the gate")
    // and nothing ELSE was dropped by robots
    assert(frontier.count() ==
      staged.where(!org.apache.spark.sql.functions.col("domain")
        .isin("m1.example", "m2.example"))
        .select("uri").distinct().count())
  }
}
