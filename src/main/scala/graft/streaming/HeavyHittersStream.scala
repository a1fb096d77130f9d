package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters — the ONLINE twin of batch qx19: per-language
  * word-frequency leaders maintained with a Misra-Gries summary of k
  * counters, so state is O(k) per language FOREVER no matter how many
  * distinct words stream past (the per-key exact map a naive spelling
  * keeps is vocabulary-sized — unbounded — state).
  *
  * Each micro-batch is count-combined locally, then merged into the
  * summary with the mergeable-summaries rule (Agarwal et al., TODS'13):
  * add counts, and if more than k keys remain, subtract the (k+1)-th
  * largest count from every key and drop the non-positives. The merge
  * preserves the Misra-Gries invariant, so at any point, for every word
  * w with true count c(w) out of n processed words:
  *
  *   est(w) ≤ c(w)           (estimates never overshoot), and
  *   est(w) ≥ c(w) − n/(k+1) (absent ⇒ est 0 ⇒ c(w) ≤ n/(k+1)),
  *
  * i.e. every word heavier than n/(k+1) is IN the summary — the
  * guarantee HeavyHittersStreamSpec pins against exact batch counts
  * across arbitrary micro-batch splits. The summary content (not the
  * bound) can depend on arrival order for near-tied words; batch qx19
  * is the exact backfill, this is the always-on monitor.
  *
  * Exactly-once: counts are additive state, so correctness rides on the
  * engine contract — transformWithState state versions commit atomically
  * with batch offsets, and a failed batch's retry rolls the summary back
  * (RecoverySpec's mechanism). No replay cursor is needed or possible
  * for an unordered multiset feed.
  *
  * Emission: after folding each batch, the processor emits the key's
  * whole summary (≤ k rows) stamped with n_seen; readers take the rows
  * with the max n_seen per language (the latest snapshot). k rows per
  * key per batch is the monitoring-feed shape, never the vocabulary. */
object HeavyHittersStream {

  /** One word occurrence on the wire (wh = the repo's Horner word hash). */
  case class WordObs(lang: String, wh: Long)

  /** A summary row: est ∈ [true − n/(k+1), true]. */
  case class HeavyHitter(lang: String, wh: Long, est: Long, n_seen: Long)

  class MisraGriesProcessor(k: Int)
      extends StatefulProcessor[String, WordObs, HeavyHitter] {
    @transient private var counters: MapState[Long, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = org.apache.spark.sql.streaming.TTLConfig.NONE
      counters = getHandle.getMapState[Long, Long]("mg",
        Encoders.scalaLong, Encoders.scalaLong, ttl)
      seen = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[WordObs],
                                 tv: TimerValues): Iterator[HeavyHitter] = {
      // Local exact combine first: the state store is touched O(k + batch
      // distinct) times per batch, not once per occurrence.
      val local = new scala.collection.mutable.HashMap[Long, Long]()
      var n = 0L
      rows.foreach { r => local.update(r.wh, local.getOrElse(r.wh, 0L) + 1L); n += 1L }

      val merged = new scala.collection.mutable.HashMap[Long, Long]()
      counters.iterator().foreach { case (wh, c) => merged.update(wh, c) }
      local.foreach { case (wh, c) => merged.update(wh, merged.getOrElse(wh, 0L) + c) }

      if (merged.size > k) {
        // Subtract the (k+1)-th largest count; strictly larger survive.
        val cut = merged.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = merged.collect { case (wh, c) if c - cut <= 0L => wh }
        dead.foreach(merged.remove)
        merged.mapValuesInPlace((_, c) => c - cut)
      }

      counters.clear()
      merged.foreach { case (wh, c) => counters.updateValue(wh, c) }
      val total = (if (seen.exists) seen.get() else 0L) + n
      seen.update(total)
      merged.iterator.map { case (wh, c) => HeavyHitter(key, wh, c, total) }
    }
  }

  /** The pipeline: word observations → one keyed-state shuffle on lang →
    * ≤ k summary rows per (lang, batch). */
  def summaries(words: Dataset[WordObs], k: Int): Dataset[HeavyHitter] = {
    implicit val outEnc = Encoders.product[HeavyHitter]
    words.groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(new MisraGriesProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
