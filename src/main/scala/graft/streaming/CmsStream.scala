package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming count-min sketch — the ONLINE qx33: per language, the same
  * D×W cell grid the batch query builds, folded live with O(D·W) state
  * per language FOREVER against an unbounded vocabulary. Where the
  * Misra-Gries stream answers "which words are heavy", the CMS grid
  * answers "roughly how often is ANY word" — point-estimable offline
  * through the state-store data source (the F11 pattern) or by snapshot.
  *
  * Same hash family as qx33, cell(i, wh) = ((wh·(1000003·(i+1)+31) +
  * 977·(i+1)) mod p) mod W — CmsStreamSpec pins the STRONGEST contract
  * available for a counting sketch: after any micro-batch split of an
  * id-ordered feed, the state grid equals the batch grid CELL FOR CELL.
  * Counters are not a set statistic, so replay safety takes the
  * [[BudgetAdmission]] cursor discipline: one row per document (its
  * word-hash multiset), rows sort by doc_id per micro-batch, docs
  * at-or-below the cursor are skipped — re-delivered waves are no-ops.
  * Unordered intake counts first-come (the documented divergence all
  * cursor processors share).
  *
  * Emission is a per-(language, batch) heartbeat (doc/word totals); the
  * grid itself stays in state — at W=1024, D=4 that is 32 KB per
  * language, the whole point of a sketch: the vocabulary never
  * materializes anywhere. */
object CmsStream {

  /** Must match qx33's grid geometry for the equality contract. */
  val W = 1024
  val D = 4

  /** One document's word-hash multiset (the unit of replay). */
  case class DocWords(lang: String, doc_id: Long, whs: Seq[Long])

  /** Per-batch heartbeat; the grid is read from state, not the sink. */
  case class CmsHeartbeat(lang: String, n_docs: Long, n_words: Long)

  private[streaming] case class Grid(cells: Seq[Long], cursor: Long, nDocs: Long, nWords: Long)

  /** Row i's cell for word-hash wh — qx33's colOf, verbatim. */
  def cellOf(i: Int, wh: Long): Int =
    (((wh * (1000003L * (i + 1) + 31L) + 977L * (i + 1)) % 2147483647L) % W).toInt

  class CmsProcessor extends StatefulProcessor[String, DocWords, CmsHeartbeat] {
    @transient private var st: ValueState[Grid] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Grid]("cms", Encoders.product[Grid],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocWords],
                                 tv: TimerValues): Iterator[CmsHeartbeat] = {
      val prev = if (st.exists) st.get() else Grid(Seq.fill(D * W)(0L), -1L, 0L, 0L)
      val cells = prev.cells.toArray
      var cursor = prev.cursor
      var nDocs = prev.nDocs
      var nWords = prev.nWords
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cursor) {
          r.whs.foreach { wh =>
            var i = 0
            while (i < D) { cells(i * W + cellOf(i, wh)) += 1L; i += 1 }
            nWords += 1L
          }
          cursor = r.doc_id
          nDocs += 1L
        }
      }
      st.update(Grid(cells.toSeq, cursor, nDocs, nWords))
      Iterator.single(CmsHeartbeat(key, nDocs, nWords))
    }
  }

  /** The pipeline: one row per document → one keyed-state shuffle on
    * lang → heartbeats; the grid lives in state. */
  def grids(docs: Dataset[DocWords]): Dataset[CmsHeartbeat] = {
    implicit val outEnc = Encoders.product[CmsHeartbeat]
    docs.groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(new CmsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
