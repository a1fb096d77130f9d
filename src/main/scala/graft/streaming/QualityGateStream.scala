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

  /** A trained lexicon model: word → (c₊, c₋) plus the decision
    * threshold r = ⌊10⁴·(T₊+V)/(T₋+V)⌋. */
  case class Model(counts: Map[String, (Long, Long)], r: Long)

  /** Per-word likelihood-ratio surrogate, the batch gate's spelling. */
  def wordScore(cPos: Long, cNeg: Long): Long = 10000L * (cPos + 1) / (cNeg + 1)

  /** Sum of word scores — unseen words score the neutral 10⁴. */
  def docScore(words: Array[String], counts: Map[String, (Long, Long)]): Long = {
    var score = 0L
    for (w <- words) {
      val (cp, cn) = counts.getOrElse(w, (0L, 0L))
      score += wordScore(cp, cn)
    }
    score
  }

  /** The admission predicate a composed door applies (one doc, no row
    * machinery) — identical arithmetic to [[verdicts]]. */
  def passes(text: String, m: Model): Boolean = {
    val words = text.split(" ").filter(_.nonEmpty)
    docScore(words, m.counts) > words.length * m.r
  }

  /** Score a document stream under a fixed model. */
  def verdicts(docs: Dataset[DocText], model: Map[String, (Long, Long)], r: Long): Dataset[DocVerdict] = {
    implicit val enc = Encoders.product[DocVerdict]
    docs.mapPartitions { it =>
      it.map { d =>
        val words = d.text.split(" ").filter(_.nonEmpty)
        val score = docScore(words, model)
        DocVerdict(d.doc_id, words.length.toLong, score, score > words.length * r)
      }
    }
  }
}
