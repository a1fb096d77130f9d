package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

import Model._

/** The stateful-processor library — Spark `transformWithState`
  * `StatefulProcessor`s covering the reference's ProcessFunction family
  * (SURVEY.md §2.9 F1-F7/F10, §2.5 W12, §2.4 A2, §2.7 M2/M3).
  *
  * Determinism note shared by all processors: Structured Streaming does not
  * guarantee an ordering of same-key rows within a micro-batch, so every
  * processor sorts its per-key batch iterator by (ts_us, event_id) before
  * folding it into state. Across batches, order is the test harness's
  * responsibility (feed batches in time order); state carries the fold.
  * This is exactly the determinization rule the batch twins use
  * (ORDER BY ts_us, event_id) — streaming output == batch-twin output.
  */
object Processors {

  private def sorted(rows: Iterator[SensorEvent]): Iterator[SensorEvent] =
    rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).iterator

  // State record types live at the object level (stable path) so
  // Encoders.product can derive them — a processor-nested case class is a
  // path-dependent type the encoder framework cannot instantiate.
  case class CountAcc(grp: Long, cnt: Long, sumScaled: Long)
  case class BestSoFar(event_id: Long, value: Double)
  case class CtrlState(ts_us: Long, level: String)

  /** F4 — ValueState delta alert: emit when |value − previous| > threshold.
    * Streaming twin of CoreQueries.q08 (reference 정리/5주차.md:24-54,
    * TemperatureAlertFunction: ValueState[lastTemp], alert on big delta).
    */
  class DeltaAlertProcessor(threshold: Double)
      extends StatefulProcessor[String, SensorEvent, DeltaAlert] {
    @transient private var lastValue: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastValue = getHandle.getValueState[Double]("lastValue", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[DeltaAlert] = {
      val out = Seq.newBuilder[DeltaAlert]
      var prev: Option[Double] = if (lastValue.exists) Some(lastValue.get) else None
      sorted(rows).foreach { r =>
        prev.foreach { p =>
          val delta = r.value - p
          if (math.abs(delta) > threshold)
            out += DeltaAlert(r.sensor_id, r.event_id, r.value, delta)
        }
        prev = Some(r.value)
      }
      prev.foreach(lastValue.update)
      out.result().iterator
    }
  }

  /** W12 — count window: per-key tumbling groups of `n` events in
    * (ts_us, event_id) order. Streaming twin of CoreQueries.q13 (reference
    * 정리/1주차.md:152: count windows are the canonical non-time window).
    *
    * State = (group index, events-in-group, quantized value sum); a group
    * row is emitted the moment its n-th event arrives. A partial trailing
    * group is flushed when a flush sentinel (event_id < 0) arrives — the
    * batch twin reports partial tail groups, and an unbounded stream by
    * definition never ends, so end-of-stream must be an explicit signal.
    * The average is accumulated as floor(v*1e6+0.5) longs, the exact
    * integerization Determinism.exactAvg uses, so the streamed avg is
    * bit-identical to the batch twin's.
    */
  class CountWindowProcessor(n: Int)
      extends StatefulProcessor[String, SensorEvent, CountWindowRow] {
    @transient private var acc: ValueState[CountAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[CountAcc]("acc", Encoders.product[CountAcc], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[CountWindowRow] = {
      val out = Seq.newBuilder[CountWindowRow]
      var a = if (acc.exists) acc.get else CountAcc(0L, 0L, 0L)
      def emit(a: CountAcc): CountWindowRow =
        CountWindowRow(key, a.grp, a.cnt, (a.sumScaled.toDouble / a.cnt.toDouble) / 1e6)
      sorted(rows).foreach { r =>
        if (r.event_id < 0) { // flush sentinel: emit the partial tail group
          if (a.cnt > 0) { out += emit(a); a = CountAcc(a.grp + 1, 0L, 0L) }
        } else {
          a = CountAcc(a.grp, a.cnt + 1, a.sumScaled + math.floor(r.value * 1e6 + 0.5).toLong)
          if (a.cnt == n) { out += emit(a); a = CountAcc(a.grp + 1, 0L, 0L) }
        }
      }
      acc.update(a)
      out.result().iterator
    }
  }

  /** A2 — exact rolling reduce: per input event, emit the running argmax
    * record for the key (reference Q/KeyedTransformations.java:55-62 emits
    * on every element — Update-mode per-event emission, which a plain
    * streaming agg only approximates per-batch). */
  class RollingMaxProcessor
      extends StatefulProcessor[String, SensorEvent, RunningMax] {
    @transient private var best: ValueState[BestSoFar] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[BestSoFar]("best", Encoders.product[BestSoFar], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[RunningMax] = {
      val out = Seq.newBuilder[RunningMax]
      var b: Option[BestSoFar] = if (best.exists) Some(best.get) else None
      sorted(rows).foreach { r =>
        // Tie-break on lower event_id, matching the batch twin's
        // ORDER BY value DESC, event_id ASC determinization (q02).
        val keep = b match {
          case Some(p) => r.value > p.value || (r.value == p.value && r.event_id < p.event_id)
          case None    => true
        }
        if (keep) b = Some(BestSoFar(r.event_id, r.value))
        out += RunningMax(key, b.get.event_id, b.get.value)
      }
      b.foreach(best.update)
      out.result().iterator
    }
  }

  /** F2/F3 — timer-based temperature-increase alert (reference
    * 정리/4주차.md:102-125 TempIncreaseAlertFunction): when a key's value
    * rises, register an event-time timer `horizonMs` ahead; a later falling
    * value cancels it; if the watermark reaches the timer first, alert —
    * i.e. "temperature has been rising for a full horizon".
    *
    * State: lastTemp (ValueState[Double]) + pending timer ts
    * (ValueState[Long]); timers themselves are engine-managed and
    * checkpointed, exactly like Flink's TimerService (F2). */
  class TempIncreaseAlertProcessor(horizonMs: Long)
      extends StatefulProcessor[String, SensorEvent, Alert] {
    @transient private var lastTemp: ValueState[Double] = _
    @transient private var timerTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTemp = getHandle.getValueState[Double]("lastTemp", Encoders.scalaDouble, TTLConfig.NONE)
      timerTs = getHandle.getValueState[Long]("timerTs", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[Alert] = {
      sorted(rows).foreach { r =>
        val prev = if (lastTemp.exists) Some(lastTemp.get) else None
        lastTemp.update(r.value)
        prev match {
          case Some(p) if r.value > p && !timerTs.exists =>
            val ts = r.ts_us / 1000L + horizonMs
            getHandle.registerTimer(ts)
            timerTs.update(ts)
          case Some(p) if r.value < p && timerTs.exists =>
            getHandle.deleteTimer(timerTs.get)
            timerTs.clear()
          case _ => ()
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Alert] = {
      timerTs.clear()
      Iterator.single(Alert(key, info.getExpiryTimeInMs,
        if (lastTemp.exists) lastTemp.get else Double.NaN,
        s"temperature of $key rose for ${horizonMs} ms"))
    }
  }

  /** M2/M3 — co-process of a control stream and a data stream via the
    * tagged-union envelope (reference Q/MultiStreamTransformations.java:
    * 62-100: smoke stream broadcast, alert iff latest smoke HIGH and
    * temp > 100). Keyed emulation of broadcast state: the pipeline
    * replicates each (tiny) control row to every key, and this processor
    * keeps the latest control level per key in ValueState — same visible
    * semantics, state sharded with the keys instead of per-task
    * (SURVEY.md §2.7 M2, divergence documented). Determinized as
    * "latest control at-or-before the data event's event time",
    * matching the q05 batch twin / AsOfJoin. */
  class LatestControlProcessor(threshold: Double)
      extends StatefulProcessor[String, Envelope, Alert] {
    @transient private var latest: ValueState[CtrlState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CtrlState]("latestCtrl", Encoders.product[CtrlState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Envelope],
                                 tv: TimerValues): Iterator[Alert] = {
      val out = Seq.newBuilder[Alert]
      // Control rows sort before data rows at equal timestamps so a data
      // event sees a control event with the same ts ("at-or-before").
      val ordered = rows.toSeq.sortBy(e => (e.ts_us, if (e.kind == "ctrl") 0 else 1, e.event_id))
      var cur: Option[CtrlState] = if (latest.exists) Some(latest.get) else None
      ordered.foreach {
        case e if e.kind == "ctrl" =>
          if (cur.forall(_.ts_us <= e.ts_us)) cur = Some(CtrlState(e.ts_us, e.level))
        case e =>
          if (cur.exists(_.level == "HIGH") && e.value > threshold)
            out += Alert(e.sensor_id, e.ts_us / 1000L, e.value, "Risk of fire")
      }
      cur.foreach(latest.update)
      out.result().iterator
    }
  }

  /** F6 — MapState: per-key CONCURRENT tumbling event-time windows, the
    * canonical per-key-map workload (reference 정리/5주차.md:10 declares
    * MapState alongside Value/ListState). A key can have many windows
    * open at once — out-of-order events reopen older windows while newer
    * ones accumulate — which a single ValueState cannot hold: the state
    * is a MAP window-end → (count, quantized sum). Each new map entry
    * registers an event-time timer at its window end; on expiry exactly
    * that entry is emitted and removed (W11-style per-window cleanup,
    * leaving sibling windows untouched). Quantization matches
    * Determinism.exactAvg, so emitted averages are bit-identical to a
    * batch groupBy twin. */
  class MapWindowCountsProcessor(windowMs: Long)
      extends StatefulProcessor[String, SensorEvent, CountWindowRow] {
    @transient private var wins: MapState[Long, CountAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      wins = getHandle.getMapState[Long, CountAcc]("wins", Encoders.scalaLong,
        Encoders.product[CountAcc], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[CountWindowRow] = {
      sorted(rows).foreach { r =>
        val end = (r.ts_us / 1000L / windowMs + 1L) * windowMs
        val scaled = math.floor(r.value * 1e6 + 0.5).toLong
        if (wins.containsKey(end)) {
          val a = wins.getValue(end)
          wins.updateValue(end, CountAcc(end, a.cnt + 1, a.sumScaled + scaled))
        } else {
          getHandle.registerTimer(end) // first event of this window
          wins.updateValue(end, CountAcc(end, 1L, scaled))
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CountWindowRow] = {
      val end = info.getExpiryTimeInMs
      if (!wins.containsKey(end)) Iterator.empty
      else {
        val a = wins.getValue(end)
        wins.removeKey(end)
        Iterator.single(
          CountWindowRow(key, end, a.cnt, (a.sumScaled.toDouble / a.cnt.toDouble) / 1e6))
      }
    }
  }

  /** F10 — TTL'd seen-keys dedup: drop events whose id was seen within the
    * TTL window. Demonstrates native state TTL (reference 정리/5주차.md:
    * 143-149 prevents state leaks with cleanup timers; Spark 4 folds that
    * into TTLConfig — engine-managed expiry, no timer bookkeeping). */
  class TtlDedupProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, SensorEvent, SensorEvent] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[SensorEvent] = {
      val first = if (!seen.exists && rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
      if (first.nonEmpty) seen.update(true)
      first
    }
  }

  /** W8/W9/W10 — custom window machinery in one processor: a GlobalWindow
    * (W8: all events of a key share one unbounded window) with a custom
    * count Trigger (W9: FIRE when `fireEvery` events have accumulated,
    * then PURGE — the reference's CONTINUE/FIRE/FIRE_AND_PURGE protocol,
    * 정리/4주차.md:305-308) and an Evictor (W10: before evaluation, drop
    * buffered elements below the `evictBelow` threshold,
    * 정리/4주차.md:310-311). Emits (key, fire#, kept-count, avg-of-kept).
    *
    * ListState is the window buffer; clearing it on fire is the W11
    * trigger-state cleanup the reference warns about. */
  class CustomTriggerWindowProcessor(fireEvery: Int, evictBelow: Double)
      extends StatefulProcessor[String, SensorEvent, CountWindowRow] {
    @transient private var buf: ListState[Double] = _
    @transient private var meta: ValueState[CountAcc] = _ // grp = fire#, cnt = since-last-fire

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Double]("winbuf", Encoders.scalaDouble, TTLConfig.NONE)
      meta = getHandle.getValueState[CountAcc]("winmeta", Encoders.product[CountAcc], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[CountWindowRow] = {
      val out = Seq.newBuilder[CountWindowRow]
      var m = if (meta.exists) meta.get else CountAcc(0L, 0L, 0L)
      sorted(rows).foreach { r =>
        buf.appendValue(r.value)
        m = m.copy(cnt = m.cnt + 1)
        if (m.cnt >= fireEvery) { // Trigger: FIRE_AND_PURGE
          val kept = buf.get.toArray.filter(_ >= evictBelow) // Evictor
          if (kept.nonEmpty)
            out += CountWindowRow(key, m.grp, kept.length.toLong, kept.sum / kept.length)
          buf.clear() // PURGE + W11 cleanup
          m = CountAcc(m.grp + 1, 0L, 0L)
        }
      }
      meta.update(m)
      out.result().iterator
    }
  }

  /** W7 — full-window process function: per (key, tumbling event-time
    * window) buffer all values in ListState and emit the exact median when
    * the watermark passes window end (event-time timer at window end —
    * reference 정리/4주차.md:228-271 buffers the whole window in a
    * ProcessWindowFunction; W11 cleanup = state cleared on fire).
    * Key of the grouped stream must be (sensor_id, window_end_ms) encoded
    * as "sensor|end" by the caller — see Pipelines.medianPerWindow. */
  class WindowMedianProcessor
      extends StatefulProcessor[String, SensorEvent, CountWindowRow] {
    @transient private var buf: ListState[Double] = _
    @transient private var fired: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Double]("buf", Encoders.scalaDouble, TTLConfig.NONE)
      fired = getHandle.getValueState[Boolean]("fired", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[CountWindowRow] = {
      // fired == true marks an already-emitted window: rows arriving after
      // the fire (possible when the caller's watermark delay lets them
      // through) are dropped, never re-fired — a second median row for the
      // same window would contradict Append mode.
      if (fired.exists && fired.get) return Iterator.empty
      val end = key.substring(key.indexOf('|') + 1).toLong
      if (!fired.exists) { getHandle.registerTimer(end); fired.update(false) }
      rows.foreach(r => buf.appendValue(r.value))
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CountWindowRow] = {
      val vs = buf.get.toArray.sorted
      buf.clear() // W11: the (large) buffer is freed at end-of-window;
      fired.update(true) // the small fired flag stays as the late-row fence
      if (vs.isEmpty) Iterator.empty
      else {
        val median =
          if (vs.length % 2 == 1) vs(vs.length / 2)
          else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0
        val (sensor, end) = key.splitAt(key.indexOf('|'))
        Iterator.single(CountWindowRow(sensor, end.drop(1).toLong, vs.length, median))
      }
    }
  }
}
