package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming token-budget admission — the ONLINE tail of the qx22
  * curation pipeline: as quality-gated, dedup-surviving docs stream in,
  * each language admits documents until its token budget is exhausted,
  * emitting admissions the moment they happen. This is the shape a live
  * intake runs ("fill the en budget, stop") where batch qx22 is the
  * backfill pass.
  *
  * Semantics mirror the batch prefix-sum rule exactly: the running
  * total accumulates EVERY processed doc's tokens (admitted or not), a
  * doc is admitted iff the total after adding it stays ≤ budget — so
  * the first overflowing doc closes the stratum, as the batch
  * `cum_tokens <= budget` filter does.
  *
  * State is O(1) per language: the running total plus a monotone
  * (h, doc_id) cursor. The cursor gives at-least-once replay safety for
  * ORDERED intake — a re-delivered doc sorts at-or-before the cursor
  * and is skipped without touching the total. Ordered intake is the
  * same precondition batch equivalence needs anyway (the batch rule
  * admits in sampling-hash order), and production gets it by routing
  * the feed through the deterministic sampler's (h, doc_id) sort key.
  * Unordered intake still admits first-come (documented divergence from
  * batch) but would need the per-language id SET for replay safety —
  * unbounded where the cursor is two longs; BudgetAdmissionSpec proves
  * the ordered contract.
  */
object BudgetAdmission {

  /** A candidate doc on the wire: already quality-gated and
    * dedup-surviving (the qx22 upstream), carrying its sampling-hash
    * sort key. */
  case class DocTok(lang: String, doc_id: Long, n_tokens: Long, h: Long)

  /** An admission, `cum_tokens` = the language's running total after
    * this doc — batch-identical schema to qx22's output. */
  case class Admitted(lang: String, doc_id: Long, n_tokens: Long, cum_tokens: Long)

  private[streaming] case class Cursor(cum: Long, h: Long, id: Long)

  /** Per-language admission: O(1) state (total + cursor), rows within a
    * micro-batch are processed in (h, doc_id) order so any batching of
    * an ordered feed yields the same admissions. */
  class BudgetProcessor(budget: Long)
      extends StatefulProcessor[String, DocTok, Admitted] {
    @transient private var st: ValueState[Cursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Cursor]("cursor", Encoders.product[Cursor],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocTok],
                                 tv: TimerValues): Iterator[Admitted] = {
      var cur = if (st.exists) st.get() else Cursor(0L, Long.MinValue, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
      // In-batch sort: a micro-batch delivers its rows unordered even
      // when the FEED is ordered across batches; sorting here makes any
      // batch split of an ordered feed equivalent.
      rows.toSeq.sortBy(r => (r.h, r.doc_id)).foreach { r =>
        val replay = r.h < cur.h || (r.h == cur.h && r.doc_id <= cur.id)
        if (!replay) {
          val cum = cur.cum + r.n_tokens
          if (cum <= budget) out += Admitted(key, r.doc_id, r.n_tokens, cum)
          cur = Cursor(cum, r.h, r.doc_id)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The pipeline: candidate docs → one keyed-state shuffle on lang →
    * admissions. The only exchange carries (lang, doc_id, n_tokens, h)
    * — four narrow columns, never text. */
  def admissions(docs: Dataset[DocTok], budget: Long): Dataset[Admitted] = {
    implicit val outEnc = Encoders.product[Admitted]
    docs.groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(new BudgetProcessor(budget),
        TimeMode.None(), OutputMode.Update())
  }
}
