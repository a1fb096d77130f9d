package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

import graft.streaming.NearDupStream.DocText

/** Streaming quality classification — the ONLINE qx63: documents are
  * scored AT INGEST against a Naive-Bayes-style lexicon model trained
  * offline on a frozen snapshot (the CCNet shape: fit the filter once,
  * meter the firehose with it). The class-count model and the decision
  * threshold ride the stream as plain broadcast Scala values —
  * vocabulary-sized, static — so the stage is STATELESS: no shuffle, no
  * state store, replays re-emit identical rows. The fourth admission
  * strategy at the ingest door (lexical bands / benchmark decon /
  * semantic cells / QUALITY).
  *
  * Arithmetic is bit-identical to batch qx63: per-word
  * s(w) = ⌊10⁴·(c₊+1)/(c₋+1)⌋ with (0,0) for unseen words (the neutral
  * 10⁴ — Laplace smoothing's answer for a zero-count word), verdict by
  * the cross-multiplied rule score > n_words · r. QualityGateStreamSpec
  * pins the streamed verdicts equal to an independent plain-Scala
  * derivation AND consistent with the batch gate's per-source rollup. */
object QualityGateStream {

  /** Per-document quality verdict under the trained lexicon model. */
  case class DocVerdict(doc_id: Long, n_words: Long, score: Long, pred_pos: Boolean)

  /** Per-word likelihood-ratio surrogate, the batch gate's spelling. */
  def wordScore(cPos: Long, cNeg: Long): Long = 10000L * (cPos + 1) / (cNeg + 1)

  /** Score a document stream under a fixed (word → (c₊, c₋)) model and
    * decision threshold r = ⌊10⁴·(T₊+V)/(T₋+V)⌋. */
  def verdicts(docs: Dataset[DocText], model: Map[String, (Long, Long)], r: Long): Dataset[DocVerdict] = {
    implicit val enc = Encoders.product[DocVerdict]
    docs.mapPartitions { it =>
      it.map { d =>
        val words = d.text.split(" ").filter(_.nonEmpty)
        var score = 0L
        for (w <- words) {
          val (cp, cn) = model.getOrElse(w, (0L, 0L))
          score += wordScore(cp, cn)
        }
        DocVerdict(d.doc_id, words.length.toLong, score, score > words.length * r)
      }
    }
  }
}
