package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-level member of the
  * dedup family (reference scope: the dedup matrix around
  * `정리/5주차.md`'s keyed-state dedup study, extended to the byte
  * layer a 100 TB corpus store needs).
  *
  * A rolling hash over a fixed window (W = 8 chars) decides chunk
  * boundaries from CONTENT alone (Muthitacharoen et al., LBFS, SOSP
  * 2001; the Rabin-fingerprint original of FastCDC): position i ends a
  * chunk iff the Horner fold of chars (i−W, i] mod 2³¹−1 lands in a
  * 1-in-64 residue class, so expected chunk length is 64 chars and —
  * unlike fixed-size blocks — an insertion only perturbs the chunks it
  * touches: every boundary whose window lies outside the edit survives,
  * so downstream chunk-hash dedup still recognizes the unchanged
  * remainder ([[CdcChunkerSpec]] pins exactly that).
  *
  * Boundary predicate is position-LOCAL (no min/max chunk bounds), so
  * the whole chunker is scan-local — no shuffle, no sequential state;
  * production FastCDC's min/max bounds need a sequential pass and live
  * in the streaming twin's territory, documented not faked. Chunk
  * identity is the pair of independent Horner folds (multipliers
  * 31 / 131, both mod 2³¹−1) plus the length: a single 2³¹ hash would
  * birthday-collide at ~10⁵ chunks; the pair pushes collisions past
  * 10⁻⁸ at gate scale.
  *
  * Implementation is a partition-parallel `mapPartitions` scan, the
  * AhoCorasick precedent for char-level operators: the same pipeline
  * spelled as array HOFs re-evaluates the O(n·W) boundary scan inside
  * every lambda call (measured quadratic — the shingleRows inlining
  * trap), and even staged through columns the interpreted HOF chain
  * measured 125 s at the 500k-doc probe vs ~4 s here. The arithmetic
  * is exactly the SQL spelling — per-step `(a·m + ascii(c)) mod P`
  * folds — so the DuckDB twin replays it expression-for-expression.
  *
  * ASCII text contract as documented at qx68 (`ascii()` reads the
  * first code point; both engines agree on single-byte chars — here
  * `charAt` matches `ascii()` on exactly that contract).
  */
object CdcChunker {

  /** Hash modulus: per-step mod keeps the accumulator < 2³¹·131+127 <
    * 2³⁸, safely in BIGINT in both engines. */
  val P = 2147483647L

  /** Rolling-window width in chars. */
  val W = 8

  /** Boundary iff windowHash % Mod == Residue → expected 64-char chunks. */
  val Mod = 64
  val Residue = 17

  /** One chunk of one document: 1-based char start, length, and the
    * 31/131 Horner identity pair. */
  final case class Chunk(doc_id: Long, source: String,
                         start: Long, len: Long, ch1: Long, ch2: Long)

  private def foldHash(text: String, from: Int, until: Int, mult: Long): Long = {
    var a = 0L
    var i = from
    while (i < until) { a = (a * mult + text.charAt(i)) % P; i += 1 }
    a
  }

  /** Pure chunker: (start, len, ch1, ch2) per chunk, 1-based, total
    * (every char in exactly one chunk; empty text → none). */
  def chunkText(text: String): IndexedSeq[(Long, Long, Long, Long)] = {
    val n = text.length
    val bounds = new ArrayBuffer[Int]
    bounds += 0
    var i = W // candidate END positions are 1-based i in [W, n]
    while (i <= n) {
      if (foldHash(text, i - W, i, 31) % Mod == Residue) bounds += i
      i += 1
    }
    if (bounds.last != n) bounds += n
    val out = new ArrayBuffer[(Long, Long, Long, Long)](bounds.size - 1)
    var j = 1
    while (j < bounds.size) {
      val s = bounds(j - 1)
      val e = bounds(j)
      if (e > s)
        out += ((s + 1L, (e - s).toLong,
          foldHash(text, s, e, 31), foldHash(text, s, e, 131)))
      j += 1
    }
    out.toIndexedSeq
  }

  /** df(doc_id, text[, source]) → one row per chunk (doc_id, source,
    * start, len, ch1, ch2), scan-partitioned (no exchange): the chunk
    * table a dedup store ingests. */
  def chunks(df: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in =
      if (df.columns.contains("source"))
        df.select(col("doc_id").cast("long"), col(textCol), col("source"))
      else df.select(col("doc_id").cast("long"), col(textCol), lit("").as("source"))
    in.as[(Long, String, String)].mapPartitions { it =>
      it.flatMap { case (id, text, src) =>
        // Total over nullable text: a null document yields zero chunks
        // instead of failing the whole partition task.
        if (text == null) Iterator.empty
        else chunkText(text).iterator.map { case (s, l, h1, h2) =>
          Chunk(id, src, s, l, h1, h2)
        }
      }
    }.toDF()
  }
}
