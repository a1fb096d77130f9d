package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.operators.DsirSelect

/** Streaming source-drift model — the ONLINE qx93, and where a drift
  * ALARM actually lives: per (source, bucket-shard), the standing
  * feature histogram a monitor compares against the corpus mixture as
  * documents arrive. State per key is a dense B/S-bucket count array
  * (~4 KB) plus the replay cursor — O(sources · B) total, never a
  * per-word row. The corpus histogram is the SUM of the per-source
  * state (no second model), so [[modelFromCheckpoint]] reconstructs
  * everything qx93's L1 statistic needs from one statestore read;
  * [[graft.DriftStreamSpec]] pins the reconstructed per-source
  * histograms cell-for-cell equal to the batch aggregation across
  * splits and replay, then computes the full qx93 drift table from
  * state and pins the gate's rows.
  *
  * Replay safety is the cursor discipline (CmsStream/DsirStream): one
  * row per (source, shard, document), rows sort by doc_id per
  * micro-batch, docs at-or-below the key's cursor are skipped. */
object DriftStream {

  /** One document's bucket sub-multiset for one (source, shard) key. */
  case class SrcShardFeats(source: String, shard: Int, doc_id: Long, bs: Seq[Long])

  /** Per-(key, batch) heartbeat; the histograms live in state. */
  case class DriftBeat(source: String, shard: Int, n_docs: Long, n_feats: Long)

  // Qualified (not plain) private, here and for every state case class
  // in this package: a plain-private nested class keeps a PRIVATE flag
  // in its InnerClasses attribute, which Janino (unlike the JVM
  // verifier) enforces — the generated state-encoder projection then
  // fails to compile ("no applicable method ... candidates are:
  // Hist.curId()") and every state read/write runs interpreted.
  // StateEncoderCodegenSpec pins the flags and the compiled path.
  private[streaming] case class Hist(cs: Seq[Long], curId: Long, nDocs: Long, nFeats: Long)

  /** Scan-local sharding of one document's features. */
  def shardRows(source: String, doc_id: Long, text: String): Iterator[SrcShardFeats] =
    DsirSelect.bucketsOf(text).groupBy(b => (b % DsirStream.S).toInt).iterator
      .map { case (s, bs) => SrcShardFeats(source, s, doc_id, bs.toSeq) }

  class DriftProcessor
      extends StatefulProcessor[(String, Int), SrcShardFeats, DriftBeat] {
    @transient private var st: ValueState[Hist] = _
    private val W = (DsirSelect.B / DsirStream.S).toInt

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Hist]("drift", Encoders.product[Hist],
        TTLConfig.NONE)

    override def handleInputRows(key: (String, Int), rows: Iterator[SrcShardFeats],
                                 tv: TimerValues): Iterator[DriftBeat] = {
      val prev = if (st.exists) st.get() else Hist(Seq.fill(W)(0L), -1L, 0L, 0L)
      val cs = prev.cs.toArray
      var cursor = prev.curId; var nDocs = prev.nDocs; var nFeats = prev.nFeats
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cursor) {
          r.bs.foreach { b => cs((b / DsirStream.S).toInt) += 1L }
          cursor = r.doc_id; nDocs += 1L; nFeats += r.bs.size
        }
      }
      st.update(Hist(cs.toSeq, cursor, nDocs, nFeats))
      Iterator.single(DriftBeat(key._1, key._2, nDocs, nFeats))
    }
  }

  /** One keyed-state shuffle on (source, shard) → per-batch
    * heartbeats; the model is the state. */
  def histograms(feats: Dataset[SrcShardFeats]): Dataset[DriftBeat] = {
    implicit val outEnc = Encoders.product[DriftBeat]
    feats.groupByKey(f => (f.source, f.shard))(
        Encoders.product[(String, Int)])
      .transformWithState(new DriftProcessor(), TimeMode.None(), OutputMode.Update())
  }

  /** Read the standing per-source histograms back from a checkpoint:
    * source → (bucket → count). */
  def modelFromCheckpoint(spark: SparkSession,
                          checkpoint: String): Map[String, Map[Long, Long]] =
    spark.read.format("statestore")
      .option("path", checkpoint).option("stateVarName", "drift").load()
      .selectExpr("key._1 AS source", "key._2 AS shard", "value.cs AS cs")
      .collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap { r =>
          val shard = r.getInt(1)
          r.getSeq[Long](2).zipWithIndex.collect {
            case (c, i) if c > 0L => (i.toLong * DsirStream.S + shard) -> c
          }
        }.toMap
      }
}
