package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming sequence packing — the ONLINE tail of qx25: as chunked
  * documents stream in, each source shard assigns chunks to fixed-size
  * training sequences by cumulative token offset, exactly the batch
  * rule (`seq_id = offset-before-this-chunk div seqLen`). A live
  * training-data build uses this to emit sequence manifests as shards
  * fill, with qx25 as the batch backfill.
  *
  * State is O(1) per source: the running token offset plus a monotone
  * (doc_id, chunk_id) cursor — the same ordered-intake contract as
  * [[BudgetAdmission]] (chunks arrive in (doc_id, chunk_id) order per
  * source, which any per-shard chunker produces naturally); replays
  * sort at-or-before the cursor and are skipped without shifting the
  * offset. Rows within a micro-batch sort by the cursor key, so any
  * batch split of an ordered feed assigns identically.
  */
object PackingStream {

  /** A chunk on the wire ([[graft.queries.ExtQueries.qx24]]'s row plus
    * its source shard). */
  case class ChunkTok(source: String, doc_id: Long, chunk_id: Long, n_tokens: Long)

  /** A sequence assignment: `off` = the token offset this chunk starts
    * at, `seq_id = off div seqLen` — batch-identical. */
  case class SeqAssigned(source: String, doc_id: Long, chunk_id: Long,
                         n_tokens: Long, seq_id: Long, off: Long)

  private[streaming] case class Cursor(off: Long, doc: Long, chunk: Long)

  class PackingProcessor(seqLen: Long)
      extends StatefulProcessor[String, ChunkTok, SeqAssigned] {
    @transient private var st: ValueState[Cursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Cursor]("cursor", Encoders.product[Cursor],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ChunkTok],
                                 tv: TimerValues): Iterator[SeqAssigned] = {
      var cur = if (st.exists) st.get() else Cursor(0L, Long.MinValue, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[SeqAssigned]
      rows.toSeq.sortBy(c => (c.doc_id, c.chunk_id)).foreach { c =>
        val replay = c.doc_id < cur.doc ||
          (c.doc_id == cur.doc && c.chunk_id <= cur.chunk)
        if (!replay) {
          out += SeqAssigned(key, c.doc_id, c.chunk_id, c.n_tokens, cur.off / seqLen, cur.off)
          cur = Cursor(cur.off + c.n_tokens, c.doc_id, c.chunk_id)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The pipeline: chunks → one keyed-state shuffle on source →
    * sequence assignments. The exchange carries four narrow columns. */
  def assignments(chunks: Dataset[ChunkTok], seqLen: Long): Dataset[SeqAssigned] = {
    implicit val outEnc = Encoders.product[SeqAssigned]
    chunks.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new PackingProcessor(seqLen),
        TimeMode.None(), OutputMode.Update())
  }
}
