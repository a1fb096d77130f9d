package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Multi-pattern BLOCKLIST scan: a dense Aho-Corasick DFA that finds
  * every occurrence of every pattern — including overlapping and
  * nested matches — in ONE pass over the text, O(1) per character
  * regardless of blocklist size. This is the scan shape a web-scale
  * curation pass needs for term blocklists, NSFW/spam lexicons and
  * killword screens: a 10k-term list run as a regexp alternation (or
  * 10k `contains` calls) costs O(len · terms) per document and
  * dominates the pipeline; the automaton costs the text scan itself.
  * (Same curation family as qx56's PII scrub — that one is
  * pattern-STRUCTURE matching, this one is dictionary matching.)
  *
  * Semantics pinned by the oracle: ALL occurrences count (a pattern
  * ending at each text position, so "aa" occurs 3× in "aaaa" and
  * nested patterns each count at their own end), `first_pos` is the
  * 1-based start of the earliest match, `hit_sig` is Σ over
  * occurrences of the 1-based pattern id — a checksum that pins WHICH
  * patterns fired and how often, not just the total.
  *
  * The DFA is the textbook construction: trie + BFS failure links,
  * with (a) the goto function completed into a DENSE transition table
  * (delta(s,c) resolved through the failure chain at build time, so
  * the scan loop never walks fail links) and (b) each state's emitted
  * pattern set precomputed by merging its own terminals with its fail
  * state's set (BFS order makes the parent set final before the
  * child). Alphabet: patterns must be 7-bit ASCII below DEL; text may
  * be ANY Unicode — every char ≥ 0x7F routes to a reserved dead class
  * (127) that no pattern can contain, so a non-ASCII char simply
  * breaks any match in progress instead of ALIASING into one (a plain
  * 7-bit mask would make 'é' (0xE9) match 'i' (0x69) — a false
  * positive, the wrong failure mode for a blocklist).
  *
  * Scale shape: partition-parallel mapPartitions, no shuffle — the
  * automaton rebuilds per partition from the pattern list (O(states ·
  * 128) ints, microseconds for real blocklists) instead of riding a
  * broadcast, so the operator has no driver-side state at all. At
  * 100 TB this is an embarrassingly parallel scan stage, same class
  * as [[HtmlCodec]]/[[MultimodalCodec]].
  */
object AhoCorasick {

  /** Per-document aggregate emitted by [[scanDF]]. */
  final case class DocHits(doc_id: Long, n_hits: Long, n_patterns: Long,
                           first_pos: Long, hit_sig: Long)

  final class Automaton(patterns: IndexedSeq[String]) extends Serializable {
    require(patterns.nonEmpty, "at least one pattern")
    require(patterns.forall(_.forall(_ < 0x7f)),
      "patterns must be 7-bit ASCII below DEL (text may be any Unicode)")
    private val A = 128

    /** Text chars ≥ DEL collapse to the reserved dead class no pattern
      * holds: they can never extend or alias a match. */
    @inline private def clazz(c: Char): Int = if (c < 0x7f) c else 0x7f

    // Trie build.
    private var cap = 16
    private var delta = Array.ofDim[Int](cap, A) // completed DFA transitions
    private var nStates = 1
    private val ends = scala.collection.mutable.Map[Int, List[Int]]()
    for (r <- delta(0).indices) delta(0)(r) = -1
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i) & 0x7f
        if (delta(s)(c) < 0) {
          if (nStates == cap) {
            cap *= 2
            val nd = Array.ofDim[Int](cap, A)
            System.arraycopy(delta, 0, nd, 0, nStates)
            delta = nd
          }
          val fresh = Array.fill(A)(-1)
          delta(nStates) = fresh
          delta(s)(c) = nStates
          nStates += 1
        }
        s = delta(s)(c)
        i += 1
      }
      ends(s) = pi :: ends.getOrElse(s, Nil)
    }

    // BFS: failure links, dense transition completion, merged emit sets.
    private val fail = new Array[Int](nStates)
    private val emit = new Array[Array[Int]](nStates)
    locally {
      val queue = scala.collection.mutable.Queue[Int]()
      emit(0) = ends.getOrElse(0, Nil).toArray
      var c = 0
      while (c < A) {
        val t = delta(0)(c)
        if (t < 0) delta(0)(c) = 0
        else { fail(t) = 0; queue.enqueue(t) }
        c += 1
      }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        emit(s) = (ends.getOrElse(s, Nil).toArray ++ emit(fail(s))).sorted
        var c2 = 0
        while (c2 < A) {
          val t = delta(s)(c2)
          if (t < 0) delta(s)(c2) = delta(fail(s))(c2)
          else { fail(t) = delta(fail(s))(c2); queue.enqueue(t) }
          c2 += 1
        }
      }
    }

    private val plen: Array[Int] = patterns.map(_.length).toArray

    /** One pass; never materializes the match list. The distinct-pattern
      * bitset is ⌈terms/64⌉ longs, reused across docs in a partition. */
    def stats(docId: Long, text: String): DocHits =
      stats(docId, text, new Array[Long]((plen.length + 63) >> 6))

    private[operators] def stats(docId: Long, text: String,
                                 mask: Array[Long]): DocHits = {
      java.util.Arrays.fill(mask, 0L)
      var s = 0
      var nHits = 0L
      var firstPos = Long.MaxValue
      var sig = 0L
      var i = 0
      while (i < text.length) {
        s = delta(s)(clazz(text.charAt(i)))
        val em = emit(s)
        var j = 0
        while (j < em.length) {
          val p = em(j)
          nHits += 1
          mask(p >> 6) |= 1L << (p & 63)
          sig += p + 1
          val start = i + 2 - plen(p) // 1-based
          if (start < firstPos) firstPos = start
          j += 1
        }
        i += 1
      }
      var nPat = 0L
      var m = 0
      while (m < mask.length) { nPat += java.lang.Long.bitCount(mask(m)); m += 1 }
      DocHits(docId, nHits, nPat, if (nHits == 0) 0L else firstPos, sig)
    }
  }

  /** Scan `docs(doc_id, text)`; emit one row per document with ≥ 1 hit. */
  def scanDF(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toIndexedSeq
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = new Automaton(pats)
        val mask = new Array[Long]((pats.length + 63) >> 6)
        it.flatMap { case (id, text) =>
          val h = ac.stats(id, text, mask)
          if (h.n_hits > 0) Some(h) else None
        }
      }
      .toDF()
  }

  /** The gate's blocklist: nested suffixes (scan/can/an, table/able),
    * shared stems (part/art) and a cross-word bigram ("a a", which
    * self-overlaps in "a a a") — chosen to keep failure links and the
    * merged emit sets load-bearing, not decorative. */
  val GateBlocklist: IndexedSeq[String] = IndexedSeq(
    "table", "able", "scan", "can", "an", "data", "at",
    "part", "art", "order", "rder", "window", "slow", "low", "a a")
}
