package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

import graft.streaming.NearDupStream.DocText

/** Streaming service of the DISTILLED logistic scorer — the online
  * qx103, and the delivery on [[graft.operators.LogisticGD]]'s promise
  * ("serve the scorer at ingest where the labeler is too slow"): the
  * expensive Gopher rule composite labels a frozen snapshot offline,
  * full-batch GD distills it into five micro-weights, and THIS stage
  * meters the firehose with them. Like [[QualityGateStream]] the model
  * rides as plain broadcast Scala values (five Longs — the smallest
  * model in the repo), so the stage is STATELESS: no shuffle, no state
  * store, replays re-emit identical rows. The fifth admission strategy
  * at the ingest door (lexical bands / benchmark decon / semantic
  * cells / NB quality / distilled-logistic quality).
  *
  * Arithmetic is bit-identical to batch qx103: the same milli features
  * (bias, capped word count, mean word length, stopword ratio,
  * distinct-word ratio — integer division on non-negative Longs), the
  * exact-Long margin, the rational fast sigmoid in the same IEEE
  * operation order, and the same milli quantization of the score.
  * LogisticServeStreamSpec pins the streamed rows equal to the batch
  * feature table scored under the same weights, doc for doc. */
object LogisticServeStream {

  /** Per-document verdict under the distilled weights. A document with
    * no words is REJECTED outright (score 0) — the batch gate excludes
    * such docs from training; at the door they are trivial spam. */
  case class DocScore(doc_id: Long, score_milli: Long, keep: Boolean)

  /** qx103's milli features of one document: (bias 1000,
    * min(W,400)·5, chars·125/W, nstop·1000/W, ndist·1000/W).
    * None when the document has no words. */
  def features(text: String): Option[Array[Long]] = {
    val words = text.split(" ").filter(_.nonEmpty)
    val w = words.length.toLong
    if (w == 0L) None
    else {
      var chars = 0L
      var nstop = 0L
      for (x <- words) {
        chars += x.length
        if (x == "the" || x == "a") nstop += 1
      }
      val ndist = words.toSet.size.toLong
      Some(Array(1000L, math.min(w, 400L) * 5L, chars * 125L / w,
        nstop * 1000L / w, ndist * 1000L / w))
    }
  }

  /** The batch scorer's exact shape: z from the exact-Long margin, the
    * rational fast sigmoid, milli quantization. */
  def scoreMilli(x: Array[Long], w: Array[Long]): Long = {
    var z9 = 0L
    var j = 0
    while (j < w.length) { z9 += w(j) * x(j); j += 1 }
    val z = z9.toDouble / 1000000000.0
    val p = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
    math.floor(p * 1000.0 + 0.5).toLong
  }

  /** The admission predicate a composed door applies. */
  def passes(text: String, w: Array[Long]): Boolean =
    features(text).exists(x => scoreMilli(x, w) >= 500L)

  /** Score a document stream under frozen distilled weights. */
  def verdicts(docs: Dataset[DocText], w: Array[Long]): Dataset[DocScore] = {
    implicit val enc = Encoders.product[DocScore]
    docs.mapPartitions { it =>
      it.map { d =>
        features(d.text) match {
          case Some(x) =>
            val s = scoreMilli(x, w)
            DocScore(d.doc_id, s, s >= 500L)
          case None => DocScore(d.doc_id, 0L, keep = false)
        }
      }
    }
  }
}
