package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-domain POLITENESS scheduling on the crawl frontier (round-8
  * verdict #9): qx72 parses `Crawl-delay` and [[RobotsGateStream]]
  * carries it per verdict, but nothing downstream consumed it. This
  * stage turns frontier-admitted candidates into SCHEDULED fetches: a
  * per-domain token bucket where fetch i's slot is
  *
  *   slot = max(arrival_ts, domain.nextFree);  nextFree = slot + delay
  *
  * — deterministic given per-domain arrival order, so the whole
  * schedule is batch-computable (the spec's oracle) while the release
  * of each fetch is TIMER-driven: an event-time timer at the slot
  * fires when the watermark passes it (the reference's F2
  * TimerService), which is what gates dispatch in a live crawler.
  *
  * State per domain: ONE long (`nextFree`, the bucket) + the pending
  * fetches awaiting release — the backlog the frontier owns anyway,
  * drained oldest-first on every timer. Scheduling state proper is
  * O(1)/domain; the exchange carries (domain, doc_id, ts, delay) —
  * constant width. At 100 TB the domain keyspace shards across the
  * state store exactly like [[DomainCapStream]]'s. */
object PolitenessStream {

  /** A frontier-admitted fetch candidate: `ts_ms` event-time arrival,
    * `delay_ms` the domain's crawl-delay (0 = no throttle). */
  case class FetchCandidate(domain: String, doc_id: Long, ts_ms: Long, delay_ms: Long)

  /** A released fetch: dispatched when the watermark passed its slot.
    * `scheduled_ms` is the token-bucket slot; `released_ms` the timer
    * expiry that dispatched it (≥ scheduled_ms). */
  case class ScheduledFetch(domain: String, doc_id: Long,
                            scheduled_ms: Long, released_ms: Long)

  private[streaming] case class Pending(doc_id: Long, at: Long)

  class PolitenessProcessor
      extends StatefulProcessor[String, FetchCandidate, ScheduledFetch] {
    @transient private var nextFree: ValueState[Long] = _
    @transient private var pending: ListState[Pending] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nextFree = getHandle.getValueState[Long]("nextFree",
        Encoders.scalaLong, TTLConfig.NONE)
      pending = getHandle.getListState[Pending]("pending",
        Encoders.product[Pending], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[FetchCandidate],
                                 tv: TimerValues): Iterator[ScheduledFetch] = {
      // In-batch (ts, doc_id) order: any micro-batch split of a
      // time-ordered feed assigns identical slots (the frontier's
      // cursor argument applied to the schedule).
      rows.toSeq.sortBy(r => (r.ts_ms, r.doc_id)).foreach { r =>
        val free = if (nextFree.exists) nextFree.get() else Long.MinValue
        val slot = math.max(r.ts_ms, free)
        pending.appendValue(Pending(r.doc_id, slot))
        nextFree.update(slot + math.max(0L, r.delay_ms))
        getHandle.registerTimer(slot)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ScheduledFetch] = {
      val t = info.getExpiryTimeInMs
      val all = pending.get().toSeq
      val (due, later) = all.partition(_.at <= t)
      if (later.isEmpty) pending.clear()
      else pending.put(later.toArray)
      due.sortBy(p => (p.at, p.doc_id)).iterator
        .map(p => ScheduledFetch(key, p.doc_id, p.at, t))
    }
  }

  /** Candidates (watermarked on `ts`) → one keyed-state shuffle on the
    * domain → timer-released scheduled fetches. */
  def schedule(candidates: Dataset[FetchCandidate]): Dataset[ScheduledFetch] = {
    implicit val outEnc = Encoders.product[ScheduledFetch]
    candidates.groupByKey(_.domain)(Encoders.STRING)
      .transformWithState(new PolitenessProcessor(),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The spec's oracle: the same token bucket folded in plain order —
    * per domain, slots for (ts, doc_id)-sorted candidates. */
  def batchSchedule(candidates: Seq[FetchCandidate]): Map[Long, Long] =
    candidates.groupBy(_.domain).flatMap { case (_, cs) =>
      var free = Long.MinValue
      cs.sortBy(r => (r.ts_ms, r.doc_id)).map { r =>
        val slot = math.max(r.ts_ms, free)
        free = slot + math.max(0L, r.delay_ms)
        r.doc_id -> slot
      }
    }
}
