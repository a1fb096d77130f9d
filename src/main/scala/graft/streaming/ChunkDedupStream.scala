package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming CDC chunk-store admission — the ONLINE qx85: documents
  * arrive, are chunked scan-locally ([[graft.operators.CdcChunker]],
  * stateless — boundaries are content-defined, so the chunker needs no
  * stream state at all), and every chunk occurrence is checked against
  * a standing per-(source, identity) store. First sight creates the
  * store entry; later sights are duplicates whose bytes a dedup store
  * would not re-write. Folding the emitted verdicts per source
  * reproduces batch qx85's accounting EXACTLY (n_chunks, n_distinct,
  * sum_bytes, dup_bytes are all order-free counts —
  * [[ChunkDedupStreamSpec]] pins equality across arbitrary micro-batch
  * splits and replay).
  *
  * State per distinct (source, ch1, ch2, len): occurrence count + a
  * monotone (doc_id, start) cursor — O(1) per chunk identity, the
  * SpanDedupStream contract: under doc-ordered intake re-delivered
  * occurrences sort at-or-below the cursor and are skipped
  * (re-emitting their original verdict would need per-occurrence
  * state; the store instead re-emits NOTHING, which keeps the fold
  * idempotent at batch granularity with a WAL/txn sink — the K6/K7
  * discipline). Sub-cursor arrivals are counted observable in state
  * (the r8 ADVICE lesson). The exchange carries (source, three longs)
  * per chunk — never text. At corpus scale this IS the standing chunk
  * index an incremental dedup store keeps (RocksDB-backed, the qx41
  * admission posture at chunk granularity).
  */
object ChunkDedupStream {

  /** One chunk occurrence (the chunker's row, keyed for the store). */
  case class ChunkObs(source: String, ch1: Long, ch2: Long, len: Long,
                      doc_id: Long, start: Long)

  /** dup = the store already held this identity; first = this arrival
    * created the entry (dup and first partition the accepted set). */
  case class ChunkVerdict(source: String, doc_id: Long, start: Long,
                          len: Long, dup: Boolean, first: Boolean)

  private[streaming] case class Store(occ: Long, curDoc: Long, curStart: Long, subCursor: Long)

  class StoreProcessor
    extends StatefulProcessor[(String, Long, Long, Long), ChunkObs, ChunkVerdict] {
    @transient private var st: ValueState[Store] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Store]("store", Encoders.product[Store],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, Long, Long, Long),
                                 rows: Iterator[ChunkObs],
                                 tv: TimerValues): Iterator[ChunkVerdict] = {
      var cur = if (st.exists) st.get() else Store(0L, Long.MinValue, Long.MinValue, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[ChunkVerdict]
      // In-batch (doc_id, start) order: any split of an ordered feed
      // admits the same occurrence sequence.
      rows.toSeq.sortBy(r => (r.doc_id, r.start)).foreach { r =>
        val above = r.doc_id > cur.curDoc ||
          (r.doc_id == cur.curDoc && r.start > cur.curStart)
        if (above) {
          val first = cur.occ == 0L
          cur = Store(cur.occ + 1L, r.doc_id, r.start, cur.subCursor)
          out += ChunkVerdict(r.source, r.doc_id, r.start, r.len,
            dup = !first, first = first)
        } else cur = cur.copy(subCursor = cur.subCursor + 1L)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** Verdict of the GLOBAL (reconciled) store — the online qx90: the
    * key is the chunk identity ALONE, so the first sight across ALL
    * sources owns the chunk and every later occurrence (any source) is
    * a duplicate attributed against the recorded owner. */
  case class GlobalVerdict(source: String, doc_id: Long, start: Long,
                           len: Long, ch1: Long, first: Boolean, owner: String)

  private[streaming] case class GStore(occ: Long, curDoc: Long, curStart: Long,
                            owner: String, subCursor: Long)

  /** The [[StoreProcessor]] contract on the identity-only key: same
    * monotone (doc_id, start) cursor, same skip-below-cursor
    * re-delivery handling, same counted sub-cursor arrivals — plus the
    * OWNER source recorded at first sight, so the downstream fold
    * reproduces batch qx90's owned/cross-dup attribution exactly under
    * doc-ordered intake ([[graft.ChunkDedupStreamSpec]] pins it across
    * splits and replay). */
  class GlobalStoreProcessor
    extends StatefulProcessor[(Long, Long, Long), ChunkObs, GlobalVerdict] {
    @transient private var st: ValueState[GStore] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GStore]("gstore", Encoders.product[GStore],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long, Long),
                                 rows: Iterator[ChunkObs],
                                 tv: TimerValues): Iterator[GlobalVerdict] = {
      var cur = if (st.exists) st.get() else GStore(0L, Long.MinValue, Long.MinValue, "", 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[GlobalVerdict]
      rows.toSeq.sortBy(r => (r.doc_id, r.start)).foreach { r =>
        val above = r.doc_id > cur.curDoc ||
          (r.doc_id == cur.curDoc && r.start > cur.curStart)
        if (above) {
          val first = cur.occ == 0L
          val owner = if (first) r.source else cur.owner
          cur = GStore(cur.occ + 1L, r.doc_id, r.start, owner, cur.subCursor)
          out += GlobalVerdict(r.source, r.doc_id, r.start, r.len, r.ch1,
            first = first, owner = owner)
        } else cur = cur.copy(subCursor = cur.subCursor + 1L)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** One keyed-state shuffle on the identity alone → per-occurrence
    * GLOBAL verdicts; folding per source reproduces qx90's reconciled
    * accounting (n_occ, n_owned, owned_bytes, dup_bytes,
    * cross_dup_bytes, store_sig). */
  def admitGlobal(chunks: Dataset[ChunkObs]): Dataset[GlobalVerdict] = {
    implicit val outEnc = Encoders.product[GlobalVerdict]
    chunks.groupByKey(c => (c.ch1, c.ch2, c.len))(
        Encoders.product[(Long, Long, Long)])
      .transformWithState(new GlobalStoreProcessor(), TimeMode.None(), OutputMode.Update())
  }

  /** Audit metric (r9 ADVICE): total sub-cursor arrivals across the
    * standing store, read back from a checkpoint via the statestore
    * source (the F11 pattern). Under the documented doc-ordered intake
    * a nonzero value is re-delivery only; GROWTH between audits with
    * no replay in between flags an ordering violation whose accounting
    * silently diverges from batch qx85 — run this after any unordered
    * multi-source intake before trusting the fold. Distributed agg —
    * no per-identity driver materialization. */
  def subCursorAudit(spark: org.apache.spark.sql.SparkSession,
                     checkpoint: String,
                     stateVarName: String = "store"): Long = {
    // stateVarName selects the processor under audit: "store" for the
    // per-source [[StoreProcessor]], "gstore" for the reconciled
    // [[GlobalStoreProcessor]] (the r10 review's catch — the audit
    // must reach BOTH cursor stores).
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    spark.read.format("statestore")
      .option("path", checkpoint).option("stateVarName", stateVarName).load()
      .selectExpr("value.subCursor AS s")
      .agg(coalesce(sum("s"), lit(0L))).head.getLong(0)
  }

  /** One keyed-state shuffle on the chunk identity → per-occurrence
    * verdicts; the per-source accounting fold happens downstream. */
  def admit(chunks: Dataset[ChunkObs]): Dataset[ChunkVerdict] = {
    implicit val outEnc = Encoders.product[ChunkVerdict]
    chunks.groupByKey(c => (c.source, c.ch1, c.ch2, c.len))(
        Encoders.product[(String, Long, Long, Long)])
      .transformWithState(new StoreProcessor(), TimeMode.None(), OutputMode.Update())
  }
}
