package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming inverted-index maintenance — the ONLINE qx86, and the
  * payoff of the segmented build's algebra: a micro-batch IS a
  * segment, so the per-term standing state is exactly the summary
  * [[graft.operators.InvertedIndex.buildSegmented]]'s merge folds —
  * (df, cf, first_doc, prev_last, Horner checksum, varint bytes) —
  * and each arriving posting extends it with the SAME composition
  * (code = doc+1 at first sight, doc − prev_last after; ck =
  * ck·1009 + code mod P; bytes += ⌈bits(code)/7⌉). After any prefix
  * of a doc-ordered corpus the emitted summaries equal the BATCH
  * build of that prefix ([[graft.IndexStreamSpec]] pins it across
  * splits and replay) — incremental index maintenance with no
  * retrain, no posting-list materialization, O(1) state per term.
  *
  * Intake contract: doc-ordered per term (the frontier cursor rule —
  * postings append; an arrival at-or-below the cursor is re-delivery,
  * skipped and COUNTED in `subCursor`, the ChunkDedupStream audit
  * discipline). The exchange carries (term, doc_id, tf) — never text;
  * tf derives scan-locally per document before the keyed shuffle. */
object IndexStream {

  val P = 2147483647L

  /** One per-document posting: tf of `term` in doc `doc_id`. */
  case class TermObs(term: String, doc_id: Long, tf: Long)

  /** The standing per-term summary — qx86's output row shape. */
  case class TermSummary(term: String, df: Long, cf: Long, first_doc: Long,
                         gap_checksum: Long, varint_bytes: Long)

  private[streaming] case class TermState(df: Long, cf: Long, fd: Long, pl: Long,
                               ck: Long, by: Long, subCursor: Long)

  /** Scan-local tokenization of one document into its posting rows —
    * the stateless half (same token rule as the batch build). */
  def postings(doc_id: Long, text: String): Iterator[TermObs] =
    // total over nullable text (the CdcChunker lesson)
    (if (text == null) Iterator.empty[String]
     else text.split(' ').iterator.filter(_.nonEmpty))
      .foldLeft(scala.collection.mutable.LinkedHashMap.empty[String, Long]) {
        (m, w) => m.updateWith(w) { c => Some(c.getOrElse(0L) + 1L) }; m
      }.iterator.map { case (t, n) => TermObs(t, doc_id, n) }

  class IndexProcessor
      extends StatefulProcessor[String, TermObs, TermSummary] {
    @transient private var st: ValueState[TermState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TermState]("idx", Encoders.product[TermState],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TermObs],
                                 tv: TimerValues): Iterator[TermSummary] = {
      var s = if (st.exists) st.get()
              else TermState(0L, 0L, -1L, -1L, 0L, 0L, 0L)
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id <= s.pl && s.df > 0L) s = s.copy(subCursor = s.subCursor + 1L)
        else {
          val code = if (s.fd < 0L) r.doc_id + 1L else r.doc_id - s.pl
          s = TermState(s.df + 1L, s.cf + r.tf,
            if (s.fd < 0L) r.doc_id else s.fd, r.doc_id,
            (s.ck * 1009L + code) % P,
            s.by + (64L - java.lang.Long.numberOfLeadingZeros(code) + 6L) / 7L,
            s.subCursor)
        }
      }
      st.update(s)
      Iterator.single(TermSummary(key, s.df, s.cf, s.fd, s.ck, s.by))
    }
  }

  /** One keyed-state shuffle on the term → per-batch updated summaries
    * (output mode Update: the LAST summary per term is the index). */
  def maintain(obs: Dataset[TermObs]): Dataset[TermSummary] = {
    implicit val outEnc = Encoders.product[TermSummary]
    obs.groupByKey(_.term)(Encoders.STRING)
      .transformWithState(new IndexProcessor(), TimeMode.None(), OutputMode.Update())
  }
}
