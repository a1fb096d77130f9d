package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming URL frontier — the ONLINE qx65: the "have we fetched this
  * URL before?" gate every crawler runs at the frontier. URLs are
  * canonicalized scan-local UPSTREAM (the qx65 regexp chain — lower,
  * strip fragment/utm, default port, trailing slash — runs codegen'd
  * in the DataFrame before the keyed shuffle; this processor never
  * sees a raw URL), then the FIRST arrival per canonical URL is
  * admitted for fetch and every later variant is flagged a duplicate
  * of that keeper.
  *
  * Semantics: FIRST-WINS in (doc_id) order — under doc_id-ordered
  * intake (production's routing, the BudgetAdmission precedent) the
  * online keeper IS batch qx65's min(doc_id) keeper, and the final
  * per-URL count equals the batch n_docs; spec-pinned both ways.
  * `n_raw_forms` is batch-only: counting distinct raw variants needs
  * a set per URL, and the frontier's whole point is O(1) state.
  *
  * State is O(1) per canonical URL: keeper id + arrival count + a
  * monotone doc_id cursor (a re-delivered doc sorts at-or-before the
  * cursor and is skipped without touching either field — replay is a
  * no-op, spec-pinned). The exchange carries (canon, doc_id) — one
  * string + one long, never the document. At crawl scale the state
  * store holds one ~100-byte row per distinct URL ever seen — the
  * RocksDB-backed frontier every production crawler keeps anyway. */
object UrlFrontierStream {

  /** A discovered URL, already canonicalized upstream. */
  case class UrlDoc(canon: String, doc_id: Long)

  /** Frontier verdict: `is_dup` = false exactly once per canonical
    * URL (the fetch admission); `keeper_id` = the admitted doc;
    * `n_docs` = arrivals for this URL so far (this row included). */
  case class FrontierVerdict(canon: String, doc_id: Long, keeper_id: Long,
                             is_dup: Boolean, n_docs: Long)

  private[streaming] case class FrontierState(keeper: Long, n: Long, cursor: Long)

  class FrontierProcessor
      extends StatefulProcessor[String, UrlDoc, FrontierVerdict] {
    @transient private var st: ValueState[FrontierState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FrontierState]("frontier",
        Encoders.product[FrontierState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[UrlDoc],
                                 tv: TimerValues): Iterator[FrontierVerdict] = {
      var cur = if (st.exists) st.get() else FrontierState(Long.MinValue, 0L, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[FrontierVerdict]
      // In-batch doc_id sort: any micro-batch split of an ordered feed
      // elects the same keeper (the DomainCapStream argument).
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cur.cursor) {
          val first = cur.n == 0L
          val keeper = if (first) r.doc_id else cur.keeper
          val n = cur.n + 1
          out += FrontierVerdict(key, r.doc_id, keeper, !first, n)
          cur = FrontierState(keeper, n, r.doc_id)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The pipeline: (canon, doc_id) rows → one keyed-state shuffle on
    * the canonical URL → frontier verdicts. */
  def verdicts(urls: Dataset[UrlDoc]): Dataset[FrontierVerdict] = {
    implicit val outEnc = Encoders.product[FrontierVerdict]
    urls.groupByKey(_.canon)(Encoders.STRING)
      .transformWithState(new FrontierProcessor(),
        TimeMode.None(), OutputMode.Update())
  }
}
