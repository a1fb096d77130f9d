package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming CDC MERGE — the ONLINE qx55: a live keyed snapshot store.
  * The standing corpus backfills per-doc ValueState; change events
  * (update / delete / insert) fold into it as they arrive, and the
  * state IS the merged snapshot — readable back through the statestore
  * source, exactly the materialized view `MERGE INTO` maintains in
  * batch.
  *
  * Semantics mirror batch qx55's MERGE precedence with TOMBSTONE
  * PERMANENCE: a delete marks the doc deleted forever; updates/inserts
  * set version 2. Tombstone permanence is what makes the fold
  * SPLIT-INDEPENDENT — batch qx55 resolves a doc's (U, D) changeset
  * pair as deleted no matter what, and a permanent tombstone reaches
  * the same fixpoint whichever micro-batch each op lands in (a
  * last-writer-wins store would need sequence numbers; the qx55
  * changeset has at most one op of each kind per doc, so the fixpoint
  * argument needs no ordering at all). Every op is idempotent (sets
  * the same values), so at-least-once replay needs NO cursor — the
  * strongest replay contract after the set-statistic sketches.
  *
  * Scale shape: one keyed-state shuffle on doc_id; state is one small
  * row per live doc (the snapshot, distributed across the state store —
  * never a driver-side table); emissions carry only changed docs. */
object MergeStream {

  /** One event at the store: `op` = B (corpus backfill) / U / D / I. */
  case class MergeOp(doc_id: Long, op: String, n_tokens: Long)

  /** A doc's current snapshot row; `deleted` = tombstone. */
  case class SnapRow(doc_id: Long, version: Long, n_tokens: Long, deleted: Boolean)

  class MergeProcessor extends StatefulProcessor[Long, MergeOp, SnapRow] {
    @transient private var st: ValueState[SnapRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SnapRow]("snap", Encoders.product[SnapRow],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MergeOp],
                                 tv: TimerValues): Iterator[SnapRow] = {
      var cur = if (st.exists) st.get() else null
      rows.foreach { r =>
        r.op match {
          case "B" =>
            // Backfill never overwrites a change that already applied.
            if (cur == null) cur = SnapRow(key, 1L, r.n_tokens, deleted = false)
          case "D" =>
            cur = SnapRow(key, 2L, if (cur == null) 0L else cur.n_tokens, deleted = true)
          case _ => // U or I: version 2 unless tombstoned
            if (cur == null || !cur.deleted)
              cur = SnapRow(key, 2L, r.n_tokens, deleted = false)
        }
      }
      if (cur != null) { st.update(cur); Iterator.single(cur) }
      else Iterator.empty
    }
  }

  /** The pipeline: op events → one keyed-state shuffle on doc_id →
    * current snapshot rows for changed docs. */
  def snapshots(ops: Dataset[MergeOp]): Dataset[SnapRow] = {
    implicit val outEnc = Encoders.product[SnapRow]
    ops.groupByKey(_.doc_id)(Encoders.scalaLong)
      .transformWithState(new MergeProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
