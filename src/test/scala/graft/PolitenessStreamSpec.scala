package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.PolitenessStream
import graft.streaming.PolitenessStream.{FetchCandidate, ScheduledFetch}

/** Per-domain politeness scheduling ([[PolitenessStream]], r8 verdict
  * #9): the token-bucket slots equal the batch-computed schedule
  * across micro-batch splits, per-domain cadence respects crawl-delay,
  * and RELEASE is watermark-gated — a fetch is dispatched by its
  * event-time timer, never before the watermark passes its slot. */
class PolitenessStreamSpec extends SparkTestBase {

  // a: 2 s delay, burst at t=1s; b: 0.5 s delay; zz: the flush domain.
  private val feed = Seq(
    FetchCandidate("a.example", 1L, 1000L, 2000L),
    FetchCandidate("a.example", 2L, 1000L, 2000L),
    FetchCandidate("b.example", 11L, 1000L, 500L),
    FetchCandidate("a.example", 3L, 1500L, 2000L),
    FetchCandidate("b.example", 12L, 1100L, 500L),
    FetchCandidate("a.example", 4L, 6000L, 2000L))

  test("slots equal the batch token-bucket; release waits for the watermark") {
    val expectSlots = PolitenessStream.batchSchedule(feed)
    // sanity on the oracle itself: a's burst spreads 2 s apart
    assert(expectSlots(1L) == 1000L && expectSlots(2L) == 3000L &&
      expectSlots(3L) == 5000L && expectSlots(4L) == 7000L)
    assert(expectSlots(11L) == 1000L && expectSlots(12L) == 1500L)

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[FetchCandidate]
    val input = MemoryStream[FetchCandidate]
    val scheduled = PolitenessStream.schedule(
      input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "0 seconds")
        .as[FetchCandidate])
    val q = scheduled.writeStream.format("memory").queryName("polite")
      .outputMode("append").option("checkpointLocation", tmpDir("ck_pol")).start()

    def released(): Seq[ScheduledFetch] =
      spark.table("polite").collect().map(r =>
        ScheduledFetch(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    try {
      // time-ordered waves, split mid-domain
      input.addData(feed.take(3)); q.processAllAvailable()
      input.addData(feed.drop(3)); q.processAllAvailable()
      val mid = released()
      // gating: nothing with a slot past the current watermark is out;
      // the t=7000 slot in particular cannot have been dispatched
      assert(!mid.exists(_.doc_id == 4L), "slot released before its watermark")
      assert(mid.forall(s => s.released_ms >= s.scheduled_ms))

      // advance the watermark far past every slot -> timers all fire
      input.addData(Seq(FetchCandidate("zz.flush", 99L, 100000L, 0L)))
      q.processAllAvailable()
      input.addData(Seq(FetchCandidate("zz.flush", 100L, 200000L, 0L)))
      q.processAllAvailable()
    } finally q.stop()

    val fin = released().filterNot(_.domain == "zz.flush")
    assert(fin.map(_.doc_id).sorted == Seq(1L, 2L, 3L, 4L, 11L, 12L))
    assert(fin.map(s => s.doc_id -> s.scheduled_ms).toMap ==
      expectSlots.view.filterKeys(k => k != 99L && k != 100L).toMap,
      s"schedule diverged: ${fin.sortBy(_.doc_id)}")
    assert(fin.forall(s => s.released_ms >= s.scheduled_ms),
      "a fetch was dispatched before its slot")
    // cadence: consecutive slots per domain spaced >= the crawl delay
    fin.groupBy(_.domain).foreach { case (d, xs) =>
      val delay = feed.find(_.domain == d).get.delay_ms
      val slots = xs.map(_.scheduled_ms).sorted
      slots.zip(slots.tail).foreach { case (p, n) =>
        assert(n - p >= delay, s"$d violated crawl-delay: $p -> $n < $delay")
      }
    }
  }
}
