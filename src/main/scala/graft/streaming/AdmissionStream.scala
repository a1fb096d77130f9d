package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming ingest-admission gate — the ONLINE flavor of the qx41 batch
  * screen: the standing corpus backfills MinHash band-bucket state, then
  * live documents probe their four buckets, verify by minhash agreement
  * against bucket members only, and come out the other side with an
  * admission verdict; admitted or not, each new doc joins the buckets so
  * later arrivals screen against it (the batch twin's smaller-id rule).
  * This is the gate a production intake runs per crawl shard, where batch
  * qx41 is the backfill/audit pass.
  *
  * Same math as the batch side, re-derived per document in one typed pass
  * ([[AdmissionStream.docMinhashes]] — the word-hash Horner fold, shingle
  * combine, 16 affine minhashes, 4 band-sig folds are spelled
  * operation-for-operation from qx41's SQL; AdmissionStreamSpec pins the
  * END-TO-END verdicts against the batch query, which pins every
  * intermediate at once). State shape follows [[NearDupStream]]: key =
  * (band << 32 | band sig), per-bucket [[ListState]] of members carrying
  * their 16 minhashes (the verify needs them), optional TTL = retention
  * horizon. Per-arrival work is bounded by [[DefaultMaxOccupancy]] at
  * every corpus size — a boilerplate band signature saturates its bucket
  * instead of growing it; the only exchange carries
  * (bucket, doc_id, 16 longs).
  *
  * ORDERING CONTRACT (the [[BudgetAdmission]] discipline): verdicts equal
  * the batch screen when the corpus backfill precedes live intake and new
  * docs arrive in doc_id order — rows landing in the same micro-batch are
  * re-sorted (corpus first, then id order) per bucket, so any
  * micro-batch SPLIT of an ordered feed resolves identically; a feed
  * that interleaves out of id order admits first-come (documented
  * divergence, the unordered-intake caveat BudgetAdmission carries).
  * Re-delivered doc_ids are ignored — at-least-once upstream delivery
  * neither self-matches nor duplicates state.
  *
  * A doc's verdict aggregates its (up to 4) bucket probes: candidates are
  * emitted per bucket in the arrival micro-batch and
  * [[AdmissionStream.resolveVerdicts]] folds them into the batch-identical
  * (doc_id, verdict, dup_of) rows — run it in `foreachBatch` (all of a
  * doc's candidates land in its arrival batch) or on the accumulated sink.
  */
object AdmissionStream {

  /** Default bucket-occupancy cap — [[NearDupStream.DefaultMaxOccupancy]]'s
    * contract applied to the admission gate: a saturated bucket keeps
    * SCREENING arrivals against its retained members (boilerplate docs
    * still match an exemplar and get rejected — the degradation is
    * conservative for admission) but stops storing new ones and counts
    * the overflow in a `ValueState`. Below the cap, verdicts are
    * byte-identical to batch qx41. The one semantic loss above it:
    * batch-dup links BETWEEN two post-saturation arrivals that share no
    * unsaturated band go unseen — acceptable precisely because such docs
    * are boilerplate the retained exemplars already represent. */
  val DefaultMaxOccupancy = NearDupStream.DefaultMaxOccupancy

  /** A document on the wire; `is_new` = live intake (false = corpus
    * backfill — populates state, never emits). */
  case class DocIn(doc_id: Long, text: String, is_new: Boolean)

  /** One (bucket, doc) probe row carrying the doc's full minhash
    * signature; `bucket` = band << 32 | band sig (sig < 2³¹). */
  case class BandRow(bucket: Long, doc_id: Long, is_new: Boolean, mh: Array[Long])

  /** Stored bucket member — same fields minus the key. */
  case class Member(doc_id: Long, is_new: Boolean, mh: Array[Long])

  /** One verified dup candidate from one bucket: `is_batch` = the match
    * is an earlier LIVE doc (batch-dup) rather than a corpus member.
    * Multi-bucket matches re-emit the same pair; [[resolveVerdicts]]'s
    * min() folds them, so the duplication is lossless. */
  case class DupCandidate(doc_id: Long, other_id: Long, is_batch: Boolean)

  private val P = 2147483647L

  /** The 16 affine minhashes of one document, or None when it has fewer
    * than 3 words (no shingles — such docs are admitted unconditionally,
    * exactly like the batch screen, which has no signature row for them).
    * Multiset shingles are fine: min() over a multiset equals min() over
    * its set (the qx4 observation). */
  def docMinhashes(text: String): Option[Array[Long]] = {
    val whs = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (w <- text.split(" ") if w.nonEmpty) {
      var x = 0L; var i = 0
      while (i < w.length) { x = (x * 31 + w.charAt(i).toLong) % 1000003; i += 1 }
      whs += x
    }
    if (whs.length < 3) None
    else {
      val mh = Array.fill(16)(Long.MaxValue)
      var i = 0
      while (i + 2 < whs.length) {
        val s = ((whs(i) * 1009 + whs(i + 1)) % P * 1009 + whs(i + 2)) % P
        var k = 0
        while (k < 16) {
          val h = ((1000003L * (k + 1) + 17) * s + 917L * (k + 1)) % P
          if (h < mh(k)) mh(k) = h
          k += 1
        }
        i += 1
      }
      Some(mh)
    }
  }

  /** The 4 band signatures: fold minhashes 4k..4k+3 by (acc·31 + mh) mod p
    * — qx41's bandSig spelling. */
  def bandSigsOf(mh: Array[Long]): Array[Long] =
    Array.tabulate(4) { b =>
      var acc = 0L; var k = 4 * b
      while (k <= 4 * b + 3) { acc = (acc * 31 + mh(k)) % P; k += 1 }
      acc
    }

  /** Per-bucket gate: corpus rows append silently; new rows verify
    * against current members (≥ `minAgree` of 16 equal minhashes), emit
    * candidates, then append — admitted or not, matching the batch
    * twin's "every batch doc with a smaller id is screened against".
    * Rows are re-sorted (corpus first, then doc_id) so one micro-batch
    * carrying both sides resolves as if delivered sequentially. */
  class AdmissionProcessor(minAgree: Int, ttl: Option[java.time.Duration],
                           maxOccupancy: Int = DefaultMaxOccupancy)
      extends StatefulProcessor[Long, BandRow, DupCandidate] {
    @transient private var members: ListState[Member] = _
    @transient private var overflow: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Member]("members", Encoders.product[Member],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
      overflow = getHandle.getValueState[Long]("overflow", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[BandRow],
                                 tv: TimerValues): Iterator[DupCandidate] = {
      val seen = scala.collection.mutable.ArrayBuffer.from(members.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
      var skipped = 0L
      rows.toSeq.sortBy(r => (r.is_new, r.doc_id)).foreach { r =>
        if (!seen.exists(_.doc_id == r.doc_id)) {
          if (r.is_new) seen.foreach { m =>
            // Corpus members always screen; live members only when older
            // (smaller id) — the batch twin's p.doc_id < n.doc_id rule.
            if (!m.is_new || m.doc_id < r.doc_id) {
              var agree = 0; var k = 0
              while (k < 16) { if (m.mh(k) == r.mh(k)) agree += 1; k += 1 }
              if (agree >= minAgree) out += DupCandidate(r.doc_id, m.doc_id, m.is_new)
            }
          }
          if (seen.size < maxOccupancy) {
            val me = Member(r.doc_id, r.is_new, r.mh)
            seen += me
            members.appendValue(me)
          } else skipped += 1
        }
      }
      if (skipped > 0)
        overflow.update((if (overflow.exists) overflow.get else 0L) + skipped)
      out.iterator
    }
  }

  /** The pipeline: documents → per-band probe rows (typed map, no
    * shuffle) → one keyed-state shuffle on the bucket → verified dup
    * candidates. `minAgree` = 8 is qx41's threshold (Jaccard ≳ 0.5). */
  def candidates(docs: Dataset[DocIn], minAgree: Int = 8,
                 ttl: Option[java.time.Duration] = None,
                 maxOccupancy: Int = DefaultMaxOccupancy): Dataset[DupCandidate] = {
    require(maxOccupancy >= 1, "maxOccupancy must be >= 1")
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val outEnc = Encoders.product[DupCandidate]
    docs.flatMap { d =>
      docMinhashes(d.text) match {
        case None => Seq.empty[BandRow]
        case Some(mh) =>
          val sigs = bandSigsOf(mh)
          (0 until 4).map(b => BandRow((b.toLong << 32) | sigs(b), d.doc_id, d.is_new, mh))
      }
    }
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .transformWithState(new AdmissionProcessor(minAgree, ttl, maxOccupancy),
        TimeMode.None(), OutputMode.Update())
  }

  /** Fold per-bucket candidates into the batch-identical verdict rows:
    * (doc_id, verdict ∈ corpus_dup|batch_dup|admitted, dup_of, −1 when
    * admitted) for every doc in `newDocs` — qx41's precedence and
    * min-id tie-break exactly. */
  def resolveVerdicts(cands: DataFrame, newDocs: DataFrame): DataFrame = {
    val cv = cands.where(!col("is_batch"))
      .groupBy("doc_id").agg(min("other_id").as("corpus_dup_of"))
    val bv = cands.where(col("is_batch"))
      .groupBy("doc_id").agg(min("other_id").as("batch_dup_of"))
    newDocs.select("doc_id")
      .join(cv, Seq("doc_id"), "left")
      .join(bv, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("corpus_dup_of").isNotNull, "corpus_dup")
          .when(col("batch_dup_of").isNotNull, "batch_dup")
          .otherwise("admitted").as("verdict"),
        coalesce(col("corpus_dup_of"), col("batch_dup_of"), lit(-1L)).as("dup_of"))
  }
}
