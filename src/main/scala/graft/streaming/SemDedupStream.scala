package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming SEMANTIC dedup — the ONLINE flavor of batch qx50
  * (SemDeDup): a trained k-means codebook (the standing qx16 index,
  * built offline and carried into the stream as a plain broadcast
  * value) assigns each arriving embedding to its `nprobe` nearest
  * cells; per-cell state holds the vectors seen so far; an arrival's
  * exact cosine is verified against CELL-MATES ONLY, and documents with
  * a lower-id match above the threshold come out flagged. The third
  * admission strategy of the ingest door — [[AdmissionStream]] screens
  * lexically (MinHash bands), [[DeconStream]] screens against
  * benchmarks, this screens MEANING — with the same candidate-bound
  * discipline: per-arrival work = Σ probed-cell occupancies, never the
  * corpus.
  *
  * The math is qx50's spelled operation-for-operation: the micro-unit
  * integer quantization, the argmax-(2·dot − ‖c‖²) cell ranking with
  * ties to the smaller cid, the exact-integer dot and the
  * dot/(√n2·√m2) IEEE double cosine — SemDedupStreamSpec pins the
  * END-TO-END drop rows against batch qx50, which pins every
  * intermediate at once. A pair sharing BOTH probed cells emits its
  * candidate from each (same cosine); [[resolveDrops]] deduplicates
  * before counting, exactly like the batch side's id-pair distinct.
  *
  * ORDERING CONTRACT (the [[AdmissionStream]] discipline): drops equal
  * the batch screen when corpus backfill precedes live intake and live
  * rows arrive in vec_id order — same-micro-batch rows re-sort (corpus
  * first, then id) per cell; out-of-id-order interleaving resolves
  * first-come (documented divergence). Re-delivered vec_ids are ignored
  * — at-least-once delivery neither self-matches nor grows state.
  *
  * State: [[ListState]] of cell members carrying their 64-dim integer
  * vector (≈ 0.5 KB each, ≤ [[DefaultMaxOccupancy]] per cell ⇒ ≤ 2 MB
  * per cell at the default cap), optional TTL as retention horizon, and
  * the same saturation semantics as the lexical gate: a full cell keeps
  * SCREENING arrivals against its retained exemplars (conservative for
  * admission) but stops storing, counting overflow in a ValueState.
  */
object SemDedupStream {

  val DefaultMaxOccupancy: Int = NearDupStream.DefaultMaxOccupancy

  /** A trained centroid: [[graft.operators.IvfAnn.trainedCentroids]]
    * output row, collected. */
  case class Cent(cid: Long, cv: Array[Long])

  /** An embedding on the wire; `is_new` = live intake (false = corpus
    * backfill — populates cell state, never emits). */
  case class VecIn(vec_id: Long, embedding: Array[Float], is_new: Boolean)

  /** One (cell, vector) probe row. */
  case class CellRow(cid: Long, vec_id: Long, is_new: Boolean, iv: Array[Long], n2: Long)

  /** Stored cell member. */
  case class CellMember(vec_id: Long, is_new: Boolean, iv: Array[Long], n2: Long)

  /** One verified near-dup: `other_id` < `vec_id` or a corpus member;
    * cosine is the exact-integer-derived IEEE double. */
  case class SemCandidate(vec_id: Long, other_id: Long, cosine: Double)

  /** qx50's micro-unit integer view of one embedding. */
  def intVec(emb: Array[Float]): Array[Long] = {
    val iv = new Array[Long](emb.length)
    var i = 0
    while (i < emb.length) {
      iv(i) = math.floor(emb(i).toDouble * 1000000.0 + 0.5).toLong
      i += 1
    }
    iv
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The `nprobe` nearest cells by argmax (2·dot − ‖c‖²), ties to the
    * smaller cid — [[graft.operators.IvfAnn.l2Probes]] re-derived for
    * one vector against the broadcast codebook. */
  def cellsOf(iv: Array[Long], books: Array[Cent], nprobe: Int): Array[Long] = {
    val scored = books.map(c => (2L * dot(iv, c.cv) - dot(c.cv, c.cv), c.cid))
    scored.sortBy { case (sc, cid) => (-sc, cid) }.take(nprobe).map(_._2)
  }

  /** Per-cell gate: corpus rows append silently; live rows verify exact
    * cosine against current members (corpus members always screen, live
    * members only when lower-id — the batch x.vec_id < y.vec_id rule),
    * emit candidates, then append under the occupancy cap. */
  class SemDedupProcessor(tau: Double, ttl: Option[java.time.Duration],
                          maxOccupancy: Int = DefaultMaxOccupancy)
      extends StatefulProcessor[Long, CellRow, SemCandidate] {
    @transient private var members: ListState[CellMember] = _
    @transient private var overflow: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[CellMember]("members",
        Encoders.product[CellMember], ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
      overflow = getHandle.getValueState[Long]("overflow", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[CellRow],
                                 tv: TimerValues): Iterator[SemCandidate] = {
      val seen = scala.collection.mutable.ArrayBuffer.from(members.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[SemCandidate]
      var skipped = 0L
      rows.toSeq.sortBy(r => (r.is_new, r.vec_id)).foreach { r =>
        if (!seen.exists(_.vec_id == r.vec_id)) {
          if (r.is_new) seen.foreach { m =>
            if (!m.is_new || m.vec_id < r.vec_id) {
              // The batch cosine spelling exactly: integer dot, then
              // dot / (sqrt(n2) * sqrt(m2)) in IEEE doubles.
              val c = dot(m.iv, r.iv).toDouble /
                (math.sqrt(r.n2.toDouble) * math.sqrt(m.n2.toDouble))
              if (c >= tau) out += SemCandidate(r.vec_id, m.vec_id, c)
            }
          }
          if (seen.size < maxOccupancy) {
            val me = CellMember(r.vec_id, r.is_new, r.iv, r.n2)
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

  /** The pipeline: embeddings → per-cell probe rows (typed flatMap
    * against the broadcast codebook, no shuffle) → one keyed-state
    * shuffle on the cell → verified near-dup candidates. `codebook` is
    * the collected trained-centroid table (K ≈ √corpus rows — the
    * bounded qx16 index; a Scala value so the stream needs no join). */
  def candidates(vecs: Dataset[VecIn], codebook: Array[Cent],
                 nprobe: Int = 2, tau: Double = 0.35,
                 ttl: Option[java.time.Duration] = None,
                 maxOccupancy: Int = DefaultMaxOccupancy): Dataset[SemCandidate] = {
    require(codebook.nonEmpty, "empty codebook")
    require(maxOccupancy >= 1, "maxOccupancy must be >= 1")
    implicit val rowEnc = Encoders.product[CellRow]
    implicit val outEnc = Encoders.product[SemCandidate]
    vecs.flatMap { v =>
      val iv = intVec(v.embedding)
      val n2 = dot(iv, iv)
      cellsOf(iv, codebook, nprobe).map(cid => CellRow(cid, v.vec_id, v.is_new, iv, n2))
    }
      .groupByKey(_.cid)(Encoders.scalaLong)
      .transformWithState(new SemDedupProcessor(tau, ttl, maxOccupancy),
        TimeMode.None(), OutputMode.Update())
  }

  /** Fold per-cell candidates into batch-qx50-identical drop rows:
    * (vec_id, n_better, max_cos). Pairs seen from two shared cells
    * dedup first, like the batch id-pair distinct. */
  def resolveDrops(cands: DataFrame): DataFrame =
    cands.select("vec_id", "other_id", "cosine").distinct()
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_better"), max("cosine").as("max_cos"))
}
