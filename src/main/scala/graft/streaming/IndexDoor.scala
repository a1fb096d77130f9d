package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.HybridIndex
import graft.sources.FileBus

/** The LIVE admission leg of the hybrid index (round-10 verdict #2):
  * a FileBus document+embedding stream flows through one foreachBatch
  * door into [[HybridIndex.addBatch]], so the persisted build/serve
  * index is maintained by the SAME bus the ingestion pipeline rides —
  * IndexStream keeps the postings state online and this door keeps the
  * dense + lexical segments on disk, closing the gap where both halves
  * existed but nothing composed them.
  *
  * Exactly-once shape (the K8 consistency-matrix row, applied to index
  * maintenance): FileBus is replayable from any WAL'd offset, and the
  * door keys each admitted segment `b<batchId>` — a kill/restart
  * replays the in-flight micro-batch with the SAME batchId over the
  * SAME record range (the offset WAL pins it), so the replay
  * overwrites its own `add=b<N>` segment dirs and re-commits an
  * identical manifest entry instead of double-counting (the
  * TxnFileSink/K6 batchId idempotence, moved onto the manifest commit
  * point; [[graft.IndexDoorSpec]] kills the query mid-feed and pins
  * the served output byte-identical to a one-shot batch admission of
  * the same corpus). Empty triggers admit nothing and commit nothing.
  *
  * Wire format — one bus record per document:
  * key = doc_id, value = `<source>\t<f0>,<f1>,...\t<text>` with the
  * embedding floats in `Float.toString` form (exact round-trip, so
  * the admitted vectors are bit-identical to a parquet read), the
  * source name tab-free by contract, and the text free to contain
  * anything but the record codec's own escapes. [[encodeDoc]] / the
  * consumers' parses are the ends of that contract. The SAME feed
  * serves TWO independently-checkpointed consumers (the Kafka
  * consumer-group shape on the FileBus seam): [[run]] admits into the
  * index, [[monitor]] maintains the [[DriftStream]] histograms —
  * the standing state [[graft.operators.RetrainTrigger.decideOnline]]
  * reads, so the whole measure→decide loop rides one bus.
  *
  * At 100 TB: each trigger touches only its admitted batch (encode =
  * two scans of the batch against broadcast frozen codebooks) plus the
  * vocabulary-bounded manifest commit; nothing rescans the standing
  * index, and [[HybridIndex.compact]]/[[HybridIndex.vacuum]] run as
  * separate maintenance under the same versioned-manifest protocol. */
object IndexDoor {

  /** One document as a bus record (the producer side of the wire
    * contract). `source` must not contain a tab. */
  def encodeDoc(docId: Long, source: String, text: String, emb: Seq[Float],
                tsMs: Long): FileBus.Record =
    FileBus.Record(docId.toString,
      source + "\t" + emb.map(_.toString).mkString(",") + "\t" + text, tsMs)

  /** Start the door: bus topic → [[HybridIndex.addBatch]] against
    * `indexDir` (which must hold a committed [[HybridIndex.build]]).
    * `maxOffsetsPerTrigger` bounds admission per trigger (the bus's
    * own admission control), keeping each segment's encode work and
    * file count trigger-sized. `compactEvery = Some(n)` folds the live
    * segments after every n-th admitted batch (the standing door's
    * segment count stays bounded instead of growing one per trigger —
    * the Lucene merge policy in its simplest form) and vacuums under
    * the default grace; both are retry-safe, so a crash between
    * addBatch and compact replays into the identical end state (the
    * replayed addBatch overwrites its segment, the replayed compact
    * derives the same live-set key). */
  def run(spark: SparkSession, busRoot: String, topic: String, indexDir: String,
          checkpoint: String, maxOffsetsPerTrigger: Option[Long] = None,
          trigger: Trigger = Trigger.ProcessingTime("1 second"),
          compactEvery: Option[Int] = None,
          graphDir: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.format("graft.sources.FileBus")
      .option("path", busRoot).option("subscribe", topic)
      .option("startingOffsets", "earliest")
    val src = maxOffsetsPerTrigger
      .fold(reader)(m => reader.option("maxOffsetsPerTrigger", m.toString)).load()
    src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val parsed = batch.select(
            col("key").cast("long").as("doc_id"),
            split(col("value"), "\t", 3).as("kv"))
          .select(col("doc_id"), col("kv").getItem(1).as("embcsv"),
            col("kv").getItem(2).as("text"))
        val docs = parsed.select(col("doc_id"), col("text"))
        val rawEmb = parsed.select(col("doc_id").as("vec_id"),
          expr("transform(split(embcsv, ','), x -> CAST(x AS FLOAT))").as("embedding"))
        HybridIndex.addBatch(spark, indexDir, docs, rawEmb,
          segKeyOpt = Some(s"b$batchId"))
        // Graph maintenance rides the SAME micro-batch (round 13, r12
        // verdict #3): the kNN graph admits the batch's vectors
        // ([[graft.operators.GraphIndex.admit]] — touched-node
        // recompute only, the per-batch-affordable leg). Idempotent
        // under re-delivery: the graph version records the b<batchId>
        // seg key and no-ops when it has already committed (the
        // index's own segment discipline one asset over).
        graphDir.foreach { g =>
          graft.operators.GraphIndex.admit(spark, indexDir, g,
            rawEmb.select(col("vec_id").as("id")), s"b$batchId")
        }
        compactEvery.foreach { n =>
          if ((batchId + 1) % n == 0) {
            HybridIndex.compact(spark, indexDir)
            HybridIndex.vacuum(spark, indexDir)
            graphDir.foreach { g =>
              // community re-propagation is edge-linear per round
              // regardless of delta size (the 374 s-per-wave probe
              // finding), so it runs HERE — the amortized maintenance
              // cadence — warm-started from the previous fixpoint;
              // and the graph asset vacuums on the same cadence (each
              // snapshot version is a full n·K-edge copy)
              graft.operators.GraphIndex.refreshCommunities(spark, indexDir, g)
              graft.operators.GraphIndex.vacuum(spark, g)
            }
          }
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The SECOND consumer on the same topic: maintain the standing
    * [[DriftStream]] per-(source, shard) histograms from the identical
    * wire records, under its own checkpoint (its own WAL'd offsets —
    * the two consumers advance independently, exactly like two Kafka
    * consumer groups). The histograms live in state; the sink is noop.
    * [[graft.operators.RetrainTrigger.decideOnline]] reads the model
    * back with [[DriftStream.modelFromCheckpoint]]. */
  def monitor(spark: SparkSession, busRoot: String, topic: String,
              checkpoint: String, maxOffsetsPerTrigger: Option[Long] = None,
              trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    import spark.implicits._
    val reader = spark.readStream.format("graft.sources.FileBus")
      .option("path", busRoot).option("subscribe", topic)
      .option("startingOffsets", "earliest")
    val src = maxOffsetsPerTrigger
      .fold(reader)(m => reader.option("maxOffsetsPerTrigger", m.toString)).load()
    val feats = src.select(
        col("key").cast("long").as("doc_id"),
        split(col("value"), "\t", 3).as("kv"))
      .select(col("doc_id"), col("kv").getItem(0).as("source"),
        col("kv").getItem(2).as("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, source, text) => DriftStream.shardRows(source, id, text) }
    DriftStream.histograms(feats)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
