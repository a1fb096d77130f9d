package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming KMV distinct-count sketch — the ONLINE qx18: per source, the
  * k minimum (hash, shingle) pairs of everything seen so far, giving a
  * live distinct-shingle estimate with O(k) state per source forever.
  *
  * Unlike the Misra-Gries summary (whose CONTENT is arrival-order
  * sensitive within its error bound), a min-k sketch is a pure SET
  * statistic: the k smallest distinct values of a union do not depend on
  * arrival order, batching, or duplication. That buys the strongest
  * streaming contract in this repo:
  *
  *  - EXACT batch equality: after any micro-batch split of the feed, the
  *    sketch equals the batch derivation (distinct (source, s), order by
  *    (h, s), take k) — not approximately, exactly;
  *  - replay idempotence for free: re-delivering any prefix re-inserts
  *    members, and inserting a member into a set is a no-op — no cursor,
  *    no ordering precondition (the cursor processors need ordered
  *    feeds; this one needs nothing).
  *
  * Dedup is by the (h, s) PAIR (s breaks hash-collision ties), so the
  * sketch is well-defined as "the k smallest distinct (h, s)"; the
  * estimator is qx18's: (k−1)·p / h_k once full, exact size before.
  *
  * Emission: one snapshot row per (source, batch) — the live profiling
  * feed. DistinctSketchStreamSpec pins batch equality across ragged
  * splits and the replay no-op. */
object DistinctSketchStream {

  /** One shingle observation; h = qx18's affine hash of s. Duplicates
    * (same doc, other docs, replays) are all absorbed by set semantics. */
  case class ShingleObs(source: String, s: Long, h: Long)

  /** Snapshot: n_sketch = members held (< k ⇒ exact distinct count),
    * kth = largest held hash (0 until full), est = the KMV estimate,
    * n_seen = observations processed (replays included) — the monotone
    * marker readers use to pick the latest snapshot per source. */
  case class SketchSnapshot(source: String, n_sketch: Long, kth: Long, est: Double,
                            n_seen: Long)

  // Parallel primitive arrays (not a nested case-class list): the state
  // encoder round-trips ArrayType(LongType) cleanly where nested product
  // lists fail to decode.
  private[streaming] case class Sketch(hs: Seq[Long], ss: Seq[Long], nSeen: Long)

  class KmvProcessor(k: Int)
      extends StatefulProcessor[String, ShingleObs, SketchSnapshot] {
    @transient private var st: ValueState[Sketch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Sketch]("kmv", Encoders.product[Sketch],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ShingleObs],
                                 tv: TimerValues): Iterator[SketchSnapshot] = {
      val prev = if (st.exists) st.get() else Sketch(Nil, Nil, 0L)
      // Set-union the batch into the sketch, keep the k smallest (h, s).
      var nRows = 0L
      val incoming = rows.map { r => nRows += 1L; (r.h, r.s) }
      val merged = (prev.hs.iterator.zip(prev.ss.iterator) ++ incoming)
        .toSet.toArray.sorted.take(k).toSeq
      val seen = prev.nSeen + nRows
      st.update(Sketch(merged.map(_._1), merged.map(_._2), seen))
      val n = merged.size.toLong
      val kth = if (merged.isEmpty) 0L else merged.last._1
      val est =
        if (n < k) n.toDouble
        else if (kth == 0L) n.toDouble
        else (k - 1).toDouble * 2147483647.0 / kth
      Iterator.single(SketchSnapshot(key, n, kth, est, seen))
    }
  }

  /** The pipeline: shingle observations → one keyed-state shuffle on
    * source → one snapshot row per (source, batch). */
  def sketches(obs: Dataset[ShingleObs], k: Int): Dataset[SketchSnapshot] = {
    implicit val outEnc = Encoders.product[SketchSnapshot]
    obs.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new KmvProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
