package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.WarcCodec
import graft.sinks.TxnFileSink

/** The LIVE crawl front door (round-8 verdict #5): crawl bytes → WARC
  * unwrap → robots compliance → URL frontier → quality screens →
  * fingerprint dedup, as one launchable multi-stage pipeline — the
  * online composition of qx77's batch WET funnel from the pieces that
  * each already carry their own spec ([[graft.operators.WarcCodec]],
  * [[RobotsGateStream]], [[UrlFrontierStream]]) under the
  * [[IngestDoor]] stage discipline: streaming stages joined by
  * transactional `batch=N` parquet handoffs ([[TxnFileSink]]), one
  * keyed-state shuffle per stateful stage, kill/restart-safe at every
  * seam (replayable handoff + idempotent txn commit = exactly-once,
  * the K8 matrix applied per stage).
  *
  *  - Stage 1 [[unwrapStage]] (STATELESS): WARC→HTTP→HTML unwrap, the
  *    qx77 scoring columns ([[score]] — shared verbatim with the batch
  *    gate, so stream==batch is equality by construction), robots
  *    verdicts under a broadcast snapshot (the [[RobotsGateStream]]
  *    kernel, applied batch-side in the sink). The handoff keeps EVERY
  *    fetched record with its flags — the funnel counts need the
  *    rejected ones too.
  *  - Stage 2 [[frontierStage]] (keyed on canonical URL): first-wins
  *    admission per URI ([[UrlFrontierStream]] state); the handoff
  *    carries frontier-admitted, robots-fetchable rows with payload
  *    columns re-joined from the stage-1 handoff (a batch-side join
  *    against committed files — never a stream-stream join).
  *  - Stage 3 [[dedupStage]] (keyed on content fingerprint): quality
  *    survivors (`ok_q`) claim their `fp` first-wins (the
  *    [[UrlFrontierStream]] processor REUSED with `canon = "fp:" ++
  *    fp` — the state contract is identical); the manifest commits one
  *    row per unique keeper with its token count.
  *  - [[counts]]: the funnel summary off the handoffs — equal to batch
  *    `qx77`'s single row when robots allow all and URIs are unique
  *    (CrawlDoorSpec pins it across kill/restart of all three stages).
  *
  * Ordering contract: intake waves are doc_id-ordered (the
  * UrlFrontierStream cursor rule), so streaming first-wins == batch
  * min(doc_id) keeper election.
  *
  * On a real crawler the frontier/robots stages run BEFORE the fetch;
  * over archived crawl bytes (this door's input, like any WET job) the
  * same verdicts replay as a compliance filter — same operators, same
  * state, fetch-side vs archive-side wiring. */
object CrawlDoor {

  /** qx77's scoring columns over [[WarcCodec.parseDF]] output: token
    * list stats, the rolling content fingerprint, and the funnel flags
    * ok_http ⊇ ok_lang ⊇ ok_q. One definition for gate and door. */
  def score(parsed: DataFrame): DataFrame = parsed
    .withColumn("ws", expr("filter(split(extracted, ' '), w -> length(w) > 0)"))
    .withColumn("n_tokens", size(col("ws")).cast("long"))
    .withColumn("n_stop", expr("size(filter(ws, w -> w IN ('the', 'a')))").cast("long"))
    .withColumn("fp", expr(
      """aggregate(transform(ws, w -> aggregate(split(w, ''), 0L,
        |  (a, c) -> (a*31 + ascii(c)) % 1000003)),
        |  0L, (a, h) -> (a * 1000003 + h) % 2147483647)""".stripMargin))
    .withColumn("ok_http", col("http_status") === 200L)
    .withColumn("ok_lang", col("ok_http") && (col("n_stop") * 20L > col("n_tokens")))
    .withColumn("ok_q", col("ok_lang") && (col("n_tokens") >= 30L))
    .drop("ws")

  /** Stage-1 handoff schema: parse columns + scores + robots verdict. */
  val stagedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("n_records", LongType, false),
    StructField("uri", StringType, true),
    StructField("http_status", LongType, false),
    StructField("mime", StringType, true),
    StructField("body_len", LongType, false),
    StructField("title", StringType, true),
    StructField("extracted", StringType, true),
    StructField("n_chars", LongType, false),
    StructField("n_tokens", LongType, false),
    StructField("n_stop", LongType, false),
    StructField("fp", LongType, false),
    StructField("ok_http", BooleanType, false),
    StructField("ok_lang", BooleanType, false),
    StructField("ok_q", BooleanType, false),
    StructField("domain", StringType, true),
    StructField("path", StringType, true),
    StructField("fetchable", BooleanType, false),
    StructField("crawl_delay", LongType, false)))

  /** Crawl bytes arriving over the [[graft.sources.FileBus]] replayable
    * transport: key = doc_id, value = base64(warc). The bus contributes
    * exactly what Kafka would — partitioned offset logs the checkpoint
    * WAL can resume — so the whole door runs off an external
    * re-playable feed (CrawlDoorSpec pins bus-fed == batch qx77). */
  def busCrawlSource(spark: SparkSession, root: String, topic: String): DataFrame =
    spark.readStream.format("graft.sources.FileBus")
      .option("path", root).option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("long").as("doc_id"),
        unbase64(col("value")).as("warc"))

  /** Stage 1: crawl-bytes stream (doc_id, warc BINARY) → unwrap +
    * score + robots → transactional handoff of every fetched record. */
  def unwrapStage(crawl: DataFrame, robotsByDomain: Map[String, String], ua: String,
                  stagedRoot: String, checkpoint: String): StreamingQuery =
    score(WarcCodec.parseDF(crawl))
      .withColumn("domain", regexp_extract(col("uri"), "^https?://([^/]+)", 1))
      .withColumn("path",
        coalesce(nullif(regexp_extract(col("uri"), "^https?://[^/]+(/.*)$", 1), lit("")),
          lit("/")))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val verdicts = RobotsGateStream.verdicts(
            batch.select(col("doc_id"), col("domain"), col("path"))
              .as[RobotsGateStream.UrlEvent],
            robotsByDomain, ua)
          .toDF().select(col("doc_id"), col("fetchable"), col("crawl_delay"))
        TxnFileSink.commit(batch.join(verdicts, "doc_id"), stagedRoot, batchId)
        ()
      }
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()

  /** Stage 2: staged records → per-URI first-wins frontier state →
    * handoff of frontier-admitted, robots-fetchable rows. */
  def frontierStage(spark: SparkSession, stagedRoot: String, frontierRoot: String,
                    checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val staged = spark.readStream.schema(stagedSchema).parquet(s"$stagedRoot/batch=*")
    UrlFrontierStream.verdicts(
        staged.select(col("uri").as("canon"), col("doc_id"))
          .as[UrlFrontierStream.UrlDoc])
      .toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stagedAll = spark.read.schema(stagedSchema).parquet(s"$stagedRoot/batch=*")
        val admitted = batch.where(!col("is_dup")).select("doc_id")
          .join(stagedAll, "doc_id")
          .where(col("fetchable"))
        TxnFileSink.commit(admitted, frontierRoot, batchId)
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Reserved domain for watermark heartbeats: rows on it advance the
    * pace stage's event clock (so pending politeness timers fire on a
    * quiet frontier — the standard low-traffic-partition heartbeat)
    * but are never committed to the paced handoff. */
  val FlushDomain = "flush.internal"

  /** Write one watermark heartbeat into the frontier handoff glob (a
    * far-future [[FlushDomain]] row the pace stage times off and never
    * commits). One definition for the spec, the soak and the live main
    * — the staged schema has exactly one Row literal to maintain. */
  def writeHeartbeat(spark: SparkSession, frontierRoot: String, i: Int): Unit = {
    val r = org.apache.spark.sql.Row(
      10000000L + i, 1L, s"http://$FlushDomain/hb$i",
      200L, "text/plain", 0L, null, "", 0L, 0L, 0L, 0L,
      false, false, false, FlushDomain, "/", false, 0L)
    spark.createDataFrame(java.util.Arrays.asList(r), stagedSchema)
      .write.mode("overwrite").parquet(s"$frontierRoot/batch=99999$i")
  }

  /** Stage 2½ (round-9 verdict #4): the frontier handoff → per-domain
    * POLITENESS pacing → handoff of RELEASED fetches. The door now
    * CONSUMES the crawl-delay the robots stage parses: each admitted
    * row becomes a [[PolitenessStream.FetchCandidate]] on the door's
    * doc-ordered intake clock (ts = doc_id seconds — the same monotone
    * order the frontier cursor contract already demands), the token
    * bucket assigns slot = max(arrival, domain.nextFree), and a fetch
    * reaches the paced handoff only when the event-time watermark
    * passes its slot. Crawl-delay is robots-native SECONDS → ms here.
    * Downstream ([[dedupStage]]) reads the paced root unchanged — the
    * released rows carry the full staged schema plus scheduled_ms /
    * released_ms, so the funnel is byte-identical, just paced
    * (CrawlDoorSpec pins funnel equality AND per-domain cadence ≥
    * crawl-delay across kill/restart). */
  def paceStage(spark: SparkSession, frontierRoot: String, pacedRoot: String,
                checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val rows = spark.readStream.schema(stagedSchema).parquet(s"$frontierRoot/batch=*")
    // +1 tick: a slot at event-time 0 would sit exactly on the initial
    // watermark and its timer would never fire.
    val cands = rows.select(
        col("domain"), col("doc_id"),
        ((col("doc_id") + 1L) * 1000L).as("ts_ms"),
        (col("crawl_delay") * 1000L).as("delay_ms"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[PolitenessStream.FetchCandidate]
    PolitenessStream.schedule(cands).toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val all = spark.read.schema(stagedSchema).parquet(s"$frontierRoot/batch=*")
        val released = batch.where(col("domain") =!= FlushDomain)
          .select(col("doc_id"), col("scheduled_ms"), col("released_ms"))
          .join(all, "doc_id")
        TxnFileSink.commit(released, pacedRoot, batchId)
        ()
      }
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Stage 3: quality survivors claim their content fingerprint
    * first-wins; the manifest is one row per unique keeper. */
  def dedupStage(spark: SparkSession, frontierRoot: String, manifestRoot: String,
                 checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val rows = spark.readStream.schema(stagedSchema).parquet(s"$frontierRoot/batch=*")
    UrlFrontierStream.verdicts(
        rows.where(col("ok_q"))
          .select(concat(lit("fp:"), col("fp")).as("canon"), col("doc_id"))
          .as[UrlFrontierStream.UrlDoc])
      .toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val all = spark.read.schema(stagedSchema).parquet(s"$frontierRoot/batch=*")
        val keepers = batch.where(!col("is_dup")).select("doc_id")
          .join(all.select("doc_id", "n_tokens"), "doc_id")
        TxnFileSink.commit(keepers, manifestRoot, batchId)
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The funnel summary off the committed handoffs — batch qx77's row
    * (robots-allow-all, unique-URI crawls). */
  def counts(spark: SparkSession, stagedRoot: String, manifestRoot: String): DataFrame = {
    val staged = spark.read.schema(stagedSchema).parquet(s"$stagedRoot/batch=*")
    val manifest = spark.read.schema(StructType(Seq(
        StructField("doc_id", LongType, false),
        StructField("n_tokens", LongType, false))))
      .parquet(s"$manifestRoot/batch=*")
    staged.agg(
        count(lit(1)).as("n_fetched"),
        sum(when(col("ok_http"), 1L).otherwise(0L)).as("n_http_ok"),
        sum(when(col("ok_lang"), 1L).otherwise(0L)).as("n_lang_ok"),
        sum(when(col("ok_q"), 1L).otherwise(0L)).as("n_quality_ok"))
      .crossJoin(manifest.agg(
        count(lit(1)).as("n_unique"),
        coalesce(sum("n_tokens"), lit(0L)).as("tokens_final")))
  }
}
