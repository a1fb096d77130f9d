package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

import graft.functions.BloomFilter
import graft.streaming.NearDupStream.DocText

/** Streaming benchmark decontamination — the ONLINE qx32: documents are
  * screened AT INGEST against a held-out evaluation set's 8-word window
  * fingerprints, so contaminated text never enters the corpus instead
  * of being mined out later (batch qx29/qx32 are the backfill/audit
  * passes). Completes the ingest gate next to [[AdmissionStream]]:
  * dedup + decon at the door.
  *
  * STATELESS by design — the eval fingerprints are small and static
  * (benchmarks are curated by definition), so they ride along as plain
  * broadcast values: the qx32 Bloom image (8 KB regardless of eval
  * size) rejects ~all windows at ~3 integer ops each, and the exact
  * window set confirms the survivors (no false positives escape, no
  * state, no shuffle — the stream twin of qx32's scan-stage predicate
  * + confirm join). Per-doc work: one pass over its words + bounded
  * probe work; a replayed doc just re-emits the same verdict
  * (idempotent downstream by doc_id, no cursor needed).
  *
  * The typed window-hash fold and the Bloom bit test are spelled
  * operation-for-operation from the batch SQL ([[windowHashes]] ↔
  * windowHashRowsFrom, [[bloomPass]] ↔ BloomFilter.probeSql);
  * DeconStreamSpec pins the END-TO-END flagged set against batch qx32
  * exactly, which pins both derivations at once. */
object DeconStream {

  /** A flagged document: `n_shared` = DISTINCT eval windows it contains. */
  case class DeconHit(doc_id: Long, n_shared: Long)

  private val P = 2147483647L
  private val W = 8

  /** The doc's DISTINCT rolling 8-word window hashes — the typed twin of
    * the batch windowHashRowsFrom chain: per-word Horner fold mod
    * 1000003, then (acc·1009 + h) mod p over each 8-word window. */
  def windowHashes(text: String): Array[Long] = {
    val whs = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (w <- text.split(" ") if w.nonEmpty) {
      var x = 0L; var i = 0
      while (i < w.length) { x = (x * 31 + w.charAt(i).toLong) % 1000003; i += 1 }
      whs += x
    }
    if (whs.length < W) Array.empty
    else {
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      var start = 0
      while (start + W <= whs.length) {
        var acc = whs(start); var i = 1
        while (i < W) { acc = (acc * 1009 + whs(start + i)) % P; i += 1 }
        out += acc
        start += 1
      }
      out.toArray
    }
  }

  /** All `d` probe bits set — [[BloomFilter.probeSql]]'s arithmetic in
    * typed form (for bits 0–63, arithmetic >> then &1 equals the SQL
    * shiftright test). */
  def bloomPass(image: Array[Long], s: Long, d: Int): Boolean = {
    val mWords = image.length
    var i = 0
    while (i < d) {
      val bit = BloomFilter.bitOf(s, i, mWords)
      if (((image((bit / 64).toInt) >> (bit % 64).toInt) & 1L) != 1L) return false
      i += 1
    }
    true
  }

  /** The screen: flatMap-only (no state, no shuffle). `evalDocs` are
    * passed through unflagged-and-unscreened, as in the batch twin's
    * anti-join (the benchmark itself is not contamination). */
  def screen(docs: Dataset[DocText], image: Array[Long], d: Int,
             evalWins: Set[Long], evalDocs: Set[Long]): Dataset[DeconHit] = {
    implicit val outEnc = Encoders.product[DeconHit]
    docs.flatMap { doc =>
      if (evalDocs.contains(doc.doc_id)) None
      else {
        val hits = windowHashes(doc.text).count(s =>
          bloomPass(image, s, d) && evalWins.contains(s))
        if (hits > 0) Some(DeconHit(doc.doc_id, hits.toLong)) else None
      }
    }
  }
}
