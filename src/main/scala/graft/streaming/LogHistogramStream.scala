package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming log₂-histogram quantile sketch — the ONLINE qx35: per
  * source, ≤64 fixed bucket counters over token lengths, giving live
  * p50/p90/p99 length estimates (≤2× by construction, qx35's contract)
  * with O(64) state per source FOREVER — the hourly-profiling quantile
  * a live intake dashboards from, where batch qx35 is the backfill.
  *
  * Counters are not a set statistic (unlike the KMV sketch, re-adding a
  * document is NOT a no-op), so replay safety takes the cursor
  * discipline [[BudgetAdmission]] established: state carries the highest
  * doc_id folded per source, rows sort by doc_id inside each micro-batch,
  * and rows at-or-below the cursor are skipped — an ordered feed (the
  * backfill/intake contract) may be split or re-delivered arbitrarily
  * and the histogram equals the batch derivation exactly. Unordered
  * intake counts first-come (the same documented divergence the other
  * cursor processors carry).
  *
  * Emission: one snapshot per (source, batch) with qx35's exact
  * estimator — smallest bucket whose cumulative count reaches the
  * nearest-rank threshold (n·pct + 99) div 100, reported as the bucket's
  * upper bound 2^(b+1) − 1. LogHistogramStreamSpec pins batch equality
  * across ragged splits and replay idempotence. */
object LogHistogramStream {

  /** One document's length observation (n_tokens > 0 upstream). */
  case class DocLen(source: String, doc_id: Long, n_tokens: Long)

  /** Snapshot, batch-identical schema to qx35's output row. */
  case class HistSnapshot(source: String, n_docs: Long,
                          p50_est: Long, p90_est: Long, p99_est: Long)

  private[streaming] case class Hist(counts: Seq[Long], cursor: Long, nDocs: Long)

  /** floor(log₂ x) = 63 − nlz(x) — `length(bin(x)) − 1` in the batch/SQL
    * spelling, identical for x ≥ 1. */
  def bucketOf(nTokens: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(nTokens)

  class HistProcessor extends StatefulProcessor[String, DocLen, HistSnapshot] {
    @transient private var st: ValueState[Hist] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Hist]("hist", Encoders.product[Hist],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocLen],
                                 tv: TimerValues): Iterator[HistSnapshot] = {
      val prev = if (st.exists) st.get() else Hist(Seq.fill(64)(0L), -1L, 0L)
      val counts = prev.counts.toArray
      var cursor = prev.cursor
      var n = prev.nDocs
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cursor && r.n_tokens > 0) {
          counts(bucketOf(r.n_tokens)) += 1L
          cursor = r.doc_id
          n += 1L
        }
      }
      st.update(Hist(counts.toSeq, cursor, n))
      def est(pct: Int): Long = {
        // Empty state (every row so far violated the n_tokens > 0
        // contract) must report unambiguous zeros, not the b=0 bucket's
        // upper bound (round-6 advice).
        if (n == 0) return 0L
        val need = (n * pct + 99) / 100
        var cum = 0L; var b = 0
        while (b < 64) {
          cum += counts(b)
          if (cum >= need) return (1L << (b + 1)) - 1
          b += 1
        }
        0L
      }
      Iterator.single(HistSnapshot(key, n, est(50), est(90), est(99)))
    }
  }

  /** The pipeline: length observations → one keyed-state shuffle on
    * source → one snapshot row per (source, batch). */
  def histograms(obs: Dataset[DocLen]): Dataset[HistSnapshot] = {
    implicit val outEnc = Encoders.product[HistSnapshot]
    obs.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new HistProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
