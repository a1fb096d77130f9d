package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.{CuratedWriter, TxnFileSink}

/** The COMPLETE live ingest door (round-6 verdict #4): decontamination →
  * quality screen (optional, round 7) → near-dup admission →
  * token-budget admission → sequence packing → curated layout, as one
  * launchable, checkpointed, exactly-once pipeline — the production
  * composition of the six spec'd twins ([[DeconStream]],
  * [[QualityGateStream]], [[AdmissionStream]], [[BudgetAdmission]],
  * [[PackingStream]], [[graft.sinks.CuratedWriter]]).
  *
  * Shape: three streaming stages joined by transactional parquet
  * handoffs ([[TxnFileSink]] `batch=N` directories — atomic rename, so
  * a downstream file source sees each batch's files appear atomically),
  * each stage with its own checkpoint. One stage = one keyed-state
  * shuffle, because the three stateful operators key on DIFFERENT
  * columns (band bucket / lang / source) — chaining them through
  * replayable handoffs is exactly how a multi-stage job runs against a
  * real bus, and it is what makes kill/restart recovery per-stage:
  * replayable source + idempotent transactional sink ⇒ exactly-once at
  * every seam (the reference's consistency matrix, applied three
  * times). IngestDoorRecoverySpec kills and restarts ALL stages
  * mid-feed and proves the final packed manifest equals the batch
  * derivation exactly.
  *
  *  - Stage 1 `gateStage` — decon (stateless Bloom + exact confirm, the
  *    qx32 screen) drops benchmark docs and contaminated docs BEFORE
  *    any state sees them; survivors probe the MinHash band-bucket
  *    state ([[GateProcessor]] — [[AdmissionStream]]'s verify loop
  *    emitting one per-bucket summary row per live doc, so ADMITTED
  *    docs are visible to the sink, not only dups); short docs (< 3
  *    words, no shingles) bypass state and are admitted unconditionally
  *    (the batch twin has no signature row for them). The foreachBatch
  *    sink folds per-bucket rows into verdicts (all of a doc's probes
  *    land in its arrival batch) and commits admitted (doc_id, lang,
  *    n_tokens) transactionally.
  *  - Stage 2 `budgetStage` — [[BudgetAdmission]] over the staged
  *    survivors, keyed by lang, cursor key = doc_id (the door admits
  *    first-come in doc_id order; the spec's batch reference applies
  *    the same prefix rule).
  *  - Stage 3 `packStage` — fixed-size chunk explode (stateless), then
  *    [[PackingStream]] assigns chunks to training sequences per lang.
  *  - [[compact]] — the batch [[CuratedWriter]] pass over the packed
  *    manifest: hive-partitioned final layout (streaming emits the
  *    manifest incrementally; the pruned/partitioned layout is a
  *    compaction, the standard lakehouse split).
  *
  * Ordering contract (inherited from BudgetAdmission/PackingStream):
  * stages preserve doc_id order per key when the feed is doc_id-ordered
  * per key, which the spec's waves are and a replayed shard remains.
  */
object IngestDoor {

  /** A document at the door; `is_new` = live intake (false = corpus
    * backfill: populates dedup state, is never admitted downstream). */
  case class DoorDoc(doc_id: Long, lang: String, text: String, is_new: Boolean)

  /** One (bucket, doc) probe row — [[AdmissionStream.BandRow]] plus the
    * payload columns the door must carry to the sink. */
  case class GateBandRow(bucket: Long, doc_id: Long, is_new: Boolean,
                         lang: String, n_tokens: Long, mh: Array[Long])

  /** Per-bucket gate summary for one live doc: min matching corpus /
    * earlier-live doc_id in THIS bucket (−1 = none). Folding min over a
    * doc's buckets yields exactly the batch screen's global min. */
  case class GateRow(doc_id: Long, lang: String, n_tokens: Long,
                     corpus_min: Long, batch_min: Long)

  /** [[AdmissionStream.AdmissionProcessor]]'s member/cap/ordering logic,
    * re-emitting per-bucket SUMMARIES (one GateRow per live doc per
    * bucket, match or not) instead of dup candidates only — the door
    * needs admitted docs on the output stream too. Same occupancy-cap
    * degradation ([[AdmissionStream.DefaultMaxOccupancy]]). */
  class GateProcessor(minAgree: Int, maxOccupancy: Int)
      extends StatefulProcessor[Long, GateBandRow, GateRow] {
    @transient private var members: ListState[AdmissionStream.Member] = _
    @transient private var overflow: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[AdmissionStream.Member]("members",
        Encoders.product[AdmissionStream.Member], TTLConfig.NONE)
      overflow = getHandle.getValueState[Long]("overflow", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[GateBandRow],
                                 tv: TimerValues): Iterator[GateRow] = {
      val seen = scala.collection.mutable.ArrayBuffer.from(members.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[GateRow]
      var skipped = 0L
      rows.toSeq.sortBy(r => (r.is_new, r.doc_id)).foreach { r =>
        if (!seen.exists(_.doc_id == r.doc_id)) {
          if (r.is_new) {
            var corpusMin = -1L
            var batchMin = -1L
            seen.foreach { m =>
              if (!m.is_new || m.doc_id < r.doc_id) {
                var agree = 0; var k = 0
                while (k < 16) { if (m.mh(k) == r.mh(k)) agree += 1; k += 1 }
                if (agree >= minAgree) {
                  if (!m.is_new) { if (corpusMin < 0 || m.doc_id < corpusMin) corpusMin = m.doc_id }
                  else if (batchMin < 0 || m.doc_id < batchMin) batchMin = m.doc_id
                }
              }
            }
            out += GateRow(r.doc_id, r.lang, r.n_tokens, corpusMin, batchMin)
          }
          if (seen.size < maxOccupancy) {
            val me = AdmissionStream.Member(r.doc_id, r.is_new, r.mh)
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

  /** Whitespace token count — the door's n_tokens, matching the batch
    * family's `size(WORDS)` convention. */
  def tokenCount(text: String): Long = {
    var n = 0L
    for (w <- text.split(" ") if w.nonEmpty) n += 1
    n
  }

  /** Stage-1 stream: decon screen → quality screen → band-bucket gate →
    * per-bucket summaries. Dropped at the door: benchmark docs
    * themselves (`evalDocs`), any doc sharing an 8-word window with the
    * eval set (Bloom prescreen + exact confirm — contaminated text must
    * never enter the dedup state, where it could shadow a later clean
    * near-dup), and — when a trained [[QualityGateStream.Model]] is
    * supplied — any LIVE doc failing the quality verdict (stateless and
    * cheap, so it runs BEFORE the stateful probe: a rejected doc never
    * occupies a dedup bucket; corpus backfill bypasses it — the
    * standing corpus already passed its own curation). Short docs (no
    * shingles) bypass the stateful probe. */
  def gateRows(docs: Dataset[DoorDoc], image: Array[Long], d: Int,
               evalWins: Set[Long], evalDocs: Set[Long], minAgree: Int = 8,
               maxOccupancy: Int = AdmissionStream.DefaultMaxOccupancy,
               quality: Option[QualityGateStream.Model] = None): Dataset[GateRow] = {
    implicit val bandEnc = Encoders.product[GateBandRow]
    implicit val gateEnc = Encoders.product[GateRow]
    val clean = docs.filter { doc =>
      !evalDocs.contains(doc.doc_id) &&
        !DeconStream.windowHashes(doc.text)
          .exists(s => DeconStream.bloomPass(image, s, d) && evalWins.contains(s)) &&
        quality.forall(m => !doc.is_new || QualityGateStream.passes(doc.text, m))
    }
    val probed = clean.flatMap { doc =>
      AdmissionStream.docMinhashes(doc.text) match {
        case None => Seq.empty[GateBandRow]
        case Some(mh) =>
          val sigs = AdmissionStream.bandSigsOf(mh)
          (0 until 4).map(b => GateBandRow((b.toLong << 32) | sigs(b), doc.doc_id,
            doc.is_new, doc.lang, tokenCount(doc.text), mh))
      }
    }
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .transformWithState(new GateProcessor(minAgree, maxOccupancy),
        TimeMode.None(), OutputMode.Update())
    val shortDocs = clean.filter(d2 => d2.is_new && AdmissionStream.docMinhashes(d2.text).isEmpty)
      .map(d2 => GateRow(d2.doc_id, d2.lang, tokenCount(d2.text), -1L, -1L))
    probed.union(shortDocs)
  }

  /** Fold per-bucket gate rows into per-doc verdicts — min over buckets
    * equals the batch screen's min over all matching pairs. */
  def resolveGate(rows: DataFrame): DataFrame =
    rows.groupBy("doc_id", "lang", "n_tokens")
      .agg(min(when(col("corpus_min") >= 0, col("corpus_min"))).as("corpus_dup_of"),
        min(when(col("batch_min") >= 0, col("batch_min"))).as("batch_dup_of"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        when(col("corpus_dup_of").isNotNull, "corpus_dup")
          .when(col("batch_dup_of").isNotNull, "batch_dup")
          .otherwise("admitted").as("verdict"),
        coalesce(col("corpus_dup_of"), col("batch_dup_of"), lit(-1L)).as("dup_of"))

  /** Schema of a stage-1 handoff row. */
  val stagedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("lang", StringType, true),
    StructField("n_tokens", LongType, false)))

  /** Stage 1: gate stream → transactional admitted-docs handoff. */
  def gateStage(docs: Dataset[DoorDoc], image: Array[Long], d: Int,
                evalWins: Set[Long], evalDocs: Set[Long],
                stagingRoot: String, checkpoint: String,
                minAgree: Int = 8,
                quality: Option[QualityGateStream.Model] = None): StreamingQuery =
    gateRows(docs, image, d, evalWins, evalDocs, minAgree,
      AdmissionStream.DefaultMaxOccupancy, quality).toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = resolveGate(batch)
          .where(col("verdict") === "admitted")
          .select("doc_id", "lang", "n_tokens")
        TxnFileSink.commit(admitted, stagingRoot, batchId)
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .start()

  /** Stage 2: staged survivors → per-language token-budget admission →
    * transactional handoff. Cursor key = doc_id (first-come order). */
  def budgetStage(spark: SparkSession, stagingRoot: String, budgetRoot: String,
                  budgetPerLang: Long, checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val admissions = BudgetAdmission.admissions(
      spark.readStream.schema(stagedSchema).parquet(s"$stagingRoot/batch=*")
        .select("doc_id", "lang", "n_tokens")
        .as[(Long, String, Long)]
        .map { case (id, lang, n) => BudgetAdmission.DocTok(lang, id, n, h = id) },
      budgetPerLang)
    admissions.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TxnFileSink.commit(batch, budgetRoot, batchId); ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Schema of a stage-2 handoff row ([[BudgetAdmission.Admitted]]). */
  val budgetSchema: StructType = StructType(Seq(
    StructField("lang", StringType, true),
    StructField("doc_id", LongType, false),
    StructField("n_tokens", LongType, false),
    StructField("cum_tokens", LongType, false)))

  /** Stage 3: budget-admitted docs → fixed-size chunks (stateless
    * explode, the qx24 rule on token counts) → per-language sequence
    * packing → transactional packed manifest. */
  def packStage(spark: SparkSession, budgetRoot: String, packedRoot: String,
                chunkLen: Long, seqLen: Long, checkpoint: String): StreamingQuery = {
    import spark.implicits._
    implicit val chunkEnc = Encoders.product[PackingStream.ChunkTok]
    val chunks = spark.readStream.schema(budgetSchema).parquet(s"$budgetRoot/batch=*")
      .select("lang", "doc_id", "n_tokens")
      .as[(String, Long, Long)]
      .flatMap { case (lang, id, n) =>
        (0L until (n + chunkLen - 1) / chunkLen).map(c =>
          PackingStream.ChunkTok(lang, id, c, math.min(chunkLen, n - c * chunkLen)))
      }
    PackingStream.assignments(chunks, seqLen).toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TxnFileSink.commit(batch, packedRoot, batchId); ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The batch compaction pass: packed manifest → hive-partitioned
    * curated layout ([[CuratedWriter]] — pruning spec'd there). */
  def compact(spark: SparkSession, packedRoot: String, outDir: String): Unit =
    CuratedWriter.writeCurated(
      spark.read.parquet(s"$packedRoot/batch=*")
        .withColumnRenamed("source", "lang"),
      outDir)
}
