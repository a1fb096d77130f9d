package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.operators.DsirSelect

/** Streaming DSIR relevance model — the ONLINE qx91: the standing
  * per-bucket (raw, target) feature counts the importance weights
  * derive from, maintained live as documents arrive. The bucket space
  * ([[DsirSelect.B]] = 8192) shards across [[S]] keys; each shard owns
  * a dense count pair for its B/S buckets (≈8 KB — the CmsStream
  * sketch posture: the model never materializes per-word rows). Any
  * consumer derives the CURRENT weight table offline through the
  * statestore source (the F11 pattern) with qx91's exact surprisal-
  * difference formula — [[graft.DsirStreamSpec]] reconstructs it after
  * splits and replay and pins the counts equal to the batch
  * aggregation CELL FOR CELL, then replays the full selection from
  * state and pins qx91's top-64.
  *
  * Counters are not a set statistic, so replay safety takes the
  * cursor discipline (the CmsStream contract): one row per (shard,
  * document) carrying that doc's bucket sub-multiset, rows sort by
  * doc_id per micro-batch, docs at-or-below the shard's cursor are
  * skipped — re-delivered waves are no-ops. Unordered intake counts
  * first-come (the documented divergence all cursor processors
  * share). */
object DsirStream {

  /** Bucket shards — state keys. B must divide evenly for the dense
    * local index (b div S at shard b % S). */
  val S = 16

  /** One document's bucket sub-multiset for one shard. */
  case class DocShardFeats(shard: Int, doc_id: Long, tgt: Long, bs: Seq[Long])

  /** Per-(shard, batch) heartbeat; the counts live in state. */
  case class ShardBeat(shard: Int, n_docs: Long, n_feats: Long)

  private[streaming] case class Counts(cr: Seq[Long], ct: Seq[Long], cursor: Long,
                            nDocs: Long, nFeats: Long)

  /** Scan-local sharding of one document's features ([[DsirSelect
    * .bucketsOf]]): one row per shard the doc touches. */
  def shardRows(doc_id: Long, tgt: Long, text: String): Iterator[DocShardFeats] =
    DsirSelect.bucketsOf(text).groupBy(b => (b % S).toInt).iterator
      .map { case (s, bs) => DocShardFeats(s, doc_id, tgt, bs.toSeq) }

  class DsirProcessor extends StatefulProcessor[Int, DocShardFeats, ShardBeat] {
    @transient private var st: ValueState[Counts] = _
    private val W = (DsirSelect.B / S).toInt

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Counts]("dsir", Encoders.product[Counts],
        TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[DocShardFeats],
                                 tv: TimerValues): Iterator[ShardBeat] = {
      val prev = if (st.exists) st.get()
                 else Counts(Seq.fill(W)(0L), Seq.fill(W)(0L), -1L, 0L, 0L)
      val cr = prev.cr.toArray; val ct = prev.ct.toArray
      var cursor = prev.cursor; var nDocs = prev.nDocs; var nFeats = prev.nFeats
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (r.doc_id > cursor) {
          r.bs.foreach { b =>
            val i = (b / S).toInt
            cr(i) += 1L
            if (r.tgt == 1L) ct(i) += 1L
          }
          cursor = r.doc_id; nDocs += 1L; nFeats += r.bs.size
        }
      }
      st.update(Counts(cr.toSeq, ct.toSeq, cursor, nDocs, nFeats))
      Iterator.single(ShardBeat(key, nDocs, nFeats))
    }
  }

  /** One keyed-state shuffle on the bucket shard → per-batch
    * heartbeats; the model is the state. */
  def counts(feats: Dataset[DocShardFeats]): Dataset[ShardBeat] = {
    implicit val outEnc = Encoders.product[ShardBeat]
    feats.groupByKey(_.shard)(Encoders.scalaInt)
      .transformWithState(new DsirProcessor(), TimeMode.None(), OutputMode.Update())
  }

  /** Read the standing model back from a checkpoint: (b, cr, ct) per
    * bucket — the input to qx91's weight formula. */
  def modelFromCheckpoint(spark: SparkSession, checkpoint: String): Map[Long, (Long, Long)] =
    spark.read.format("statestore")
      .option("path", checkpoint).option("stateVarName", "dsir").load()
      .selectExpr("key.value AS shard", "value.cr AS cr", "value.ct AS ct")
      .collect()
      .flatMap { r =>
        val shard = r.getInt(0)
        val cr = r.getSeq[Long](1); val ct = r.getSeq[Long](2)
        cr.indices.map(i => (i.toLong * S + shard) -> (cr(i), ct(i)))
      }.toMap
  }
