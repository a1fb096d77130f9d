package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming exact-substring claims — the ONLINE qx70: as documents
  * arrive, each of their K-token spans (gram hashes with positions,
  * materialized scan-local upstream exactly like the batch gate) is
  * checked against a standing FIRST-OCCURRENCE table; a span already
  * claimed by an earlier (doc_id, start) is flagged for removal. The
  * per-doc interval merge (gaps-and-islands) is a DOC-LOCAL,
  * deterministic post-pass on the flagged positions — it needs no
  * cross-doc state, so it stays out of the keyed processor (run it in
  * the sink/batch layer; SpanDedupStreamSpec does exactly that and
  * pins the rolled-up verdicts equal to batch qx70).
  *
  * State per distinct gram hash: keeper (doc_id, i) + a monotone
  * doc_id cursor — O(1), the UrlFrontierStream contract: under
  * doc_id-ordered intake the online keeper IS batch qx70's
  * min(doc_id, i) keeper, re-delivered docs sort at-or-below the
  * cursor and are skipped, and the exchange carries (gram, doc_id, i)
  * — three longs, never text. At corpus scale this is the standing
  * gram table an incremental ExactSubstr keeps anyway (RocksDB-backed,
  * the qx41 incremental-dedup posture at span granularity). */
object SpanDedupStream {

  /** One span occurrence: gram = 64-bit span hash, i = token start. */
  case class SpanObs(gram: Long, doc_id: Long, i: Long)

  /** claimed = an earlier occurrence holds this span (remove here). */
  case class SpanVerdict(doc_id: Long, i: Long, claimed: Boolean,
                         keeper_doc: Long, keeper_i: Long)

  /** `subCursor` counts rows that arrived strictly below the cursor —
    * re-deliveries in the documented doc_id-ordered contract, but a
    * genuine ordering violation lands in the same bucket, so the count
    * makes a broken intake OBSERVABLE (statestore-readable) instead of
    * silently absorbed (r8 ADVICE). */
  private[streaming] case class Claim(doc: Long, i: Long, cursor: Long, subCursor: Long)

  class ClaimProcessor extends StatefulProcessor[Long, SpanObs, SpanVerdict] {
    @transient private var st: ValueState[Claim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Claim]("claim", Encoders.product[Claim],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SpanObs],
                                 tv: TimerValues): Iterator[SpanVerdict] = {
      var cur = if (st.exists) st.get()
                else Claim(Long.MaxValue, Long.MaxValue, Long.MinValue, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[SpanVerdict]
      // in-batch (doc_id, i) order: any split of an ordered feed elects
      // the same claimant (the UrlFrontierStream argument)
      rows.toSeq.sortBy(r => (r.doc_id, r.i)).foreach { r =>
        if (r.doc_id > cur.cursor ||
            (r.doc_id == cur.cursor && cur.doc != Long.MaxValue)) {
          if (cur.doc == Long.MaxValue)
            cur = Claim(r.doc_id, r.i, r.doc_id, cur.subCursor)
          else cur = cur.copy(cursor = math.max(cur.cursor, r.doc_id))
          // identity check against the STANDING claim (not "was first
          // this batch"), so a re-delivered keeper row re-emits its
          // original claimed=false verdict — emission is idempotent.
          val isKeeper = cur.doc == r.doc_id && cur.i == r.i
          out += SpanVerdict(r.doc_id, r.i, claimed = !isKeeper, cur.doc, cur.i)
        } else cur = cur.copy(subCursor = cur.subCursor + 1L)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** One keyed-state shuffle on the gram hash → per-occurrence
    * verdicts; doc-local interval merge happens downstream. */
  def claims(spans: Dataset[SpanObs]): Dataset[SpanVerdict] = {
    implicit val outEnc = Encoders.product[SpanVerdict]
    spans.groupByKey(_.gram)(Encoders.scalaLong)
      .transformWithState(new ClaimProcessor(), TimeMode.None(), OutputMode.Update())
  }
}
