package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming priority sampling — the ONLINE twin of batch qx81: a
  * weighted k-sample over everything that has streamed past, held in
  * O(k) state forever. Priority sampling is one-pass BY CONSTRUCTION
  * (Duffield–Lund–Thorup: keep the k+1 highest priorities w/u), so
  * the online operator IS the batch operator with its top-k heap in
  * the state store — no approximation gap, unlike the sketch twins.
  *
  * The state fold is a pure MAX-merge: insert-or-ignore by doc id,
  * keep the k+1 best by (priority DESC, id ASC). That makes it
  * ORDER-FREE and IDEMPOTENT — re-delivered or reordered observations
  * cannot change the result (same id ⇒ same deterministic priority ⇒
  * same heap) — the replay contract the spec pins by feeding the
  * corpus reversed and duplicated. Exactly-once therefore does not
  * even depend on the engine's state/offset atomicity; at-least-once
  * delivery suffices.
  *
  * Scale shape: the keyed merge point is inherently single (it is a
  * GLOBAL sample), so each micro-batch is pre-pruned map-side by a
  * partition-local top-(k+1) (`localTopK`, the streaming image of
  * topk_by's partial pass): ≤ k+1 rows per input partition cross the
  * shuffle, and state writes are O(k) per batch. A per-stratum sample
  * is the same operator keyed by the stratum column.
  *
  * Emission: the current sample snapshot (rank 1..k and the k+1
  * threshold row that feeds the max(w, τ) estimator), stamped with
  * n_seen; readers take the rows at max n_seen. n_seen is a MONOTONE
  * snapshot version stamp (ids accepted as new against heap+batch),
  * not an exact distinct count: an id cut from the heap and later
  * re-delivered recounts, because remembering every seen id would be
  * unbounded state (qx73's HLL is the distinct-count operator). The
  * SAMPLE is unaffected — determinism of the priority makes the merge
  * idempotent regardless. */
object PrioritySampleStream {

  /** One weighted observation; priority is derived, not carried. */
  case class DocObs(doc_id: Long, w: Long)

  /** A snapshot row: rk ∈ [1, k] sample, rk = k+1 the τ row. */
  case class SampleRow(rk: Long, doc_id: Long, w: Long, pri: Double, n_seen: Long)

  private[streaming] case class Entry(doc_id: Long, w: Long, pri: Double)

  /** The qx81 priority: u from the squared affine hash, one multiply
    * one divide — bit-identical to the batch/oracle expression. */
  def priority(docId: Long, w: Long): Double = {
    val h1 = (docId * 1000003L + 12345L) % 2147483647L
    val h = (h1 * h1) % 2147483647L
    w.toDouble * 2147483647.0 / (h.toDouble + 0.5)
  }

  private val entryOrd: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)](e => (-e.pri, e.doc_id))

  private def cut(entries: Seq[Entry], k: Int): List[Entry] =
    entries.distinct.sorted(entryOrd).take(k + 1).toList

  class SampleProcessor(k: Int)
      extends StatefulProcessor[String, DocObs, SampleRow] {
    @transient private var heap: org.apache.spark.sql.streaming.ListState[Entry] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = org.apache.spark.sql.streaming.TTLConfig.NONE
      heap = getHandle.getListState[Entry]("heap", Encoders.product[Entry], ttl)
      seen = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[DocObs],
                                 tv: TimerValues): Iterator[SampleRow] = {
      val prev = heap.get().toList
      val seenIds = prev.map(_.doc_id).toSet
      var n = if (seen.exists) seen.get() else 0L
      val incoming = scala.collection.mutable.ArrayBuffer[Entry]()
      val batchIds = scala.collection.mutable.HashSet[Long]()
      rows.foreach { r =>
        // Accept each id once across heap+batch (see the n_seen caveat
        // in the object scaladoc).
        if (!seenIds.contains(r.doc_id) && batchIds.add(r.doc_id)) {
          n += 1L
          incoming += Entry(r.doc_id, r.w, priority(r.doc_id, r.w))
        }
      }
      val merged = cut(prev ++ incoming, k)
      heap.clear()
      heap.appendList(merged.toArray)
      seen.update(n)
      merged.iterator.zipWithIndex.map { case (e, i) =>
        SampleRow(i + 1L, e.doc_id, e.w, e.pri, n)
      }
    }
  }

  /** Partition-local top-(k+1) pre-prune, then the single-key merge. */
  def sample(obs: Dataset[DocObs], k: Int): Dataset[SampleRow] = {
    implicit val obsEnc = Encoders.product[DocObs]
    implicit val outEnc = Encoders.product[SampleRow]
    val pruned = obs.mapPartitions { it =>
      // Bounded fold: re-cut whenever the buffer hits 4(k+1), so the
      // pre-prune holds O(k) memory however large the micro-batch slice.
      var buf = List.empty[Entry]
      var pending = scala.collection.mutable.ArrayBuffer[Entry]()
      it.foreach { o =>
        pending += Entry(o.doc_id, o.w, priority(o.doc_id, o.w))
        if (pending.size >= 4 * (k + 1)) {
          buf = cut(buf ++ pending, k)
          pending = scala.collection.mutable.ArrayBuffer[Entry]()
        }
      }
      cut(buf ++ pending, k).iterator.map(e => DocObs(e.doc_id, e.w))
    }
    pruned.groupByKey(_ => "all")(Encoders.STRING)
      .transformWithState(new SampleProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
