package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

import graft.streaming.NearDupStream.DocText

/** Streaming BPE tokenization — the ONLINE qx61: documents are token-
  * counted AT INGEST under a vocabulary trained offline (qx60), the shape
  * every production pipeline uses (train the tokenizer on a frozen
  * snapshot; meter the stream with it). The merge table is a plain
  * broadcast Scala value — vocabulary-sized, static — so the stream stage
  * is STATELESS: no shuffle, no state store, replays re-emit identical
  * rows (idempotent by doc_id), batch splits invisible by construction.
  *
  * The per-word rewrite is the same greedy LEFT-TO-RIGHT non-overlapping
  * merge as [[graft.operators.BpeTrainer]]'s fold (BpeStreamSpec pins the
  * stream row set equal to batch qx61 exactly); a per-partition memo
  * caches each distinct word's token count — the typed rendering of the
  * batch side's vocabulary-table broadcast join, amortizing the fold to
  * once per distinct word per partition. */
object BpeStream {

  /** Per-document token accounting under the trained vocabulary. */
  case class DocTokens(doc_id: Long, n_words: Long, n_bpe_tokens: Long)

  val EndMark: String = graft.operators.BpeTrainer.EndMark

  /** Apply trained merges to one word — greedy left-to-right,
    * non-overlapping, merge list in training order. */
  def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndMark
    for ((l, r) <- merges) {
      // The merged symbol l+r is strictly longer than l, so it can never
      // retrigger the rule in the same pass — the fold IS the greedy
      // non-overlapping rewrite (same argument as BpeTrainer).
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      for (s <- syms) {
        if (buf.nonEmpty && buf.last == l && s == r) buf(buf.length - 1) = l + r
        else buf += s
      }
      syms = buf.toVector
    }
    syms
  }

  /** Token-count a document stream under a fixed merge table. */
  def tokenCounts(docs: Dataset[DocText], merges: Seq[(String, String)]): Dataset[DocTokens] = {
    implicit val enc = Encoders.product[DocTokens]
    docs.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { d =>
        val words = d.text.split(" ").filter(_.nonEmpty)
        var total = 0L
        for (w <- words)
          total += memo.getOrElseUpdate(w, tokenize(w, merges).length.toLong)
        DocTokens(d.doc_id, words.length.toLong, total)
      }
    }
  }
}
