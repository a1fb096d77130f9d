package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** S4/K2 — Kafka source and sink builders (reference 정리/6주차.md:33-93).
  *
  * This environment has no broker and no kafka connector jar (zero
  * egress), so these builders are exercised up to plan construction —
  * KafkaSpec asserts the options each builder stamps on the reader/writer
  * (the part that IS checkable without a broker); against a real cluster
  * they are the complete mapping of the reference's consumer/producer
  * surface:
  *
  *  - start positions (group offsets / earliest / latest / explicit
  *    per-partition map, 정리/6주차.md:49-54) → `startingOffsets`, with
  *    [[perPartitionOffsets]] building the JSON form
  *  - offset tracking across failures → checkpoint WAL (same recovery
  *    model as the reference's checkpointed consumer offsets)
  *  - producer semantics NONE/AT_LEAST_ONCE (정리/6주차.md:78-82) →
  *    Spark's Kafka sink is at-least-once; EXACTLY_ONCE has no
  *    transactional producer in Spark — route through an idempotent
  *    downstream key or a foreachBatch WAL (Sinks.walBatchWriter), per
  *    the K8 consistency matrix
  *  - event-time → message timestamp: include a `timestamp` column
  *
  * Round 9: the start-position and recovery SEMANTICS are additionally
  * proven live against [[graft.sources.FileBus]] — a Kafka-shaped
  * replayable bus (partitioned offset logs, same DSv2 seam, consuming
  * [[perPartitionOffsets]]' exact JSON wire format) — so S4/K2 are
  * semantics-proven on an emulated transport, not just plan-asserted
  * (FileBusSpec: earliest/latest/explicit/-2/-1/timestamp starts,
  * kill/restart exactly-once, idempotent producer epochs).
  */
object Kafka {

  /** The consumer options the reference's start-position surface maps to. */
  def sourceOptions(bootstrap: String, topics: String,
                    startingOffsets: String = "latest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topics,
    "startingOffsets" -> startingOffsets)

  /** The reference's explicit per-partition start positions
    * (정리/6주차.md:53: a (topic, partition) → offset map) in the JSON
    * form `startingOffsets` accepts: `{"topic":{"0":23,"1":-2}}`
    * (-2 = earliest, -1 = latest). Keys are emitted in sorted order so
    * the built plan is deterministic. */
  def perPartitionOffsets(offsets: Map[(String, Int), Long]): String =
    offsets.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (topic, m) =>
      val parts = m.toSeq.map { case ((_, p), off) => p -> off }.sortBy(_._1)
        .map { case (p, off) => s""""$p":$off""" }.mkString(",")
      s""""$topic":{$parts}"""
    }.mkString("{", ",", "}")

  /** The typed projection applied to raw Kafka records (the reference
    * consumes typed records; Kafka hands us bytes). `timestamp` rides
    * along as the event-time column. */
  val recordProjection: Seq[String] = Seq(
    "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
    "topic", "partition", "offset", "timestamp")

  /** Reader with all consumer options stamped, pre-`load()` — the
    * testable boundary (load() needs the connector on the classpath). */
  def sourceReader(spark: SparkSession, bootstrap: String, topics: String,
                   startingOffsets: String = "latest"): DataStreamReader =
    spark.readStream.format("kafka")
      .options(sourceOptions(bootstrap, topics, startingOffsets))

  /** Streaming read of `topics`. `startingOffsets`: "earliest", "latest",
    * or [[perPartitionOffsets]] JSON — the reference's start positions. */
  def source(spark: SparkSession, bootstrap: String, topics: String,
             startingOffsets: String = "latest"): DataFrame =
    sourceReader(spark, bootstrap, topics, startingOffsets)
      .load()
      .selectExpr(recordProjection: _*)

  /** The producer options (at-least-once; see object doc for the
    * exactly-once routing). */
  def sinkOptions(bootstrap: String, topic: String,
                  checkpointLocation: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "checkpointLocation" -> checkpointLocation)

  /** At-least-once sink to `topic`. The frame must carry a `value` column
    * (and optionally `key`); a `timestamp` column propagates event time to
    * the message, the reference's K2 timestamp passthrough. */
  def sink(df: DataFrame, bootstrap: String, topic: String,
           checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .options(sinkOptions(bootstrap, topic, checkpointLocation))
}
