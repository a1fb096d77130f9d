package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming per-domain document cap — the ONLINE qx62: as crawled docs
  * stream in, each registered domain (eTLD+1, extracted upstream)
  * admits at most `cap` documents — the intake rate-limiter every
  * web-scale pipeline runs at the door so an SEO farm cannot flood a
  * batch while the batch-side hash-rank cap (qx62) is the backfill
  * pass.
  *
  * Semantics: FIRST-COME admission in (doc_id) order — the online cap
  * necessarily admits by arrival where batch qx62 ranks by affine hash
  * over the whole corpus (an arrival-time gate cannot know that a
  * smaller-hash doc arrives tomorrow; documented divergence, the
  * BudgetAdmission first-come precedent). When the feed is routed in
  * hash order — production's move, same as the budget stage — the two
  * admit identically.
  *
  * State is O(1) per domain: admitted count + total seen + a monotone
  * doc_id cursor (the BudgetAdmission replay contract: a re-delivered
  * doc sorts at-or-before the cursor and is skipped without moving
  * either counter; ordered intake is the precondition, spec-pinned).
  * The exchange carries (domain, doc_id) — two narrow columns, never
  * text; a hot domain costs one counter, not a bucket of members. */
object DomainCapStream {

  /** A doc at the cap: domain already extracted (the qx62 regex runs
    * scan-local upstream). */
  case class DocDomain(domain: String, doc_id: Long)

  /** Cap verdict: `rk` = this doc's 1-based admission rank within its
    * domain (admitted ⇔ rk ≤ cap); `n_seen` = domain arrivals so far. */
  case class CapVerdict(domain: String, doc_id: Long, rk: Long,
                        admitted: Boolean, n_seen: Long)

  private[streaming] case class CapState(admitted: Long, seen: Long, cursor: Long)

  class CapProcessor(cap: Int)
      extends StatefulProcessor[String, DocDomain, CapVerdict] {
    @transient private var st: ValueState[CapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CapState]("cap", Encoders.product[CapState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocDomain],
                                 tv: TimerValues): Iterator[CapVerdict] = {
      var cur = if (st.exists) st.get() else CapState(0L, 0L, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[CapVerdict]
      // In-batch doc_id sort: any micro-batch split of an ordered feed
      // admits the same prefix (the BudgetAdmission argument).
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cur.cursor) {
          val seen = cur.seen + 1
          val admit = cur.admitted < cap
          val admitted = cur.admitted + (if (admit) 1L else 0L)
          out += CapVerdict(key, r.doc_id, if (admit) admitted else -1L, admit, seen)
          cur = CapState(admitted, seen, r.doc_id)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The pipeline: (domain, doc_id) rows → one keyed-state shuffle on
    * domain → cap verdicts. */
  def verdicts(docs: Dataset[DocDomain], cap: Int): Dataset[CapVerdict] = {
    implicit val outEnc = Encoders.product[CapVerdict]
    docs.groupByKey(_.domain)(Encoders.STRING)
      .transformWithState(new CapProcessor(cap),
        TimeMode.None(), OutputMode.Update())
  }
}
