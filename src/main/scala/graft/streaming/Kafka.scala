package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** S4/K2 — Kafka source and sink builders (reference 정리/6주차.md:33-93).
  *
  * This environment has no broker (zero egress), so these builders are
  * exercised only up to plan construction; against a real cluster they are
  * the complete mapping of the reference's consumer/producer surface:
  *
  *  - start positions (group offsets / earliest / latest / explicit
  *    per-partition map, 정리/6주차.md:49-54) → `startingOffsets`
  *  - offset tracking across failures → checkpoint WAL (same recovery
  *    model as the reference's checkpointed consumer offsets)
  *  - producer semantics NONE/AT_LEAST_ONCE (정리/6주차.md:78-82) →
  *    Spark's Kafka sink is at-least-once; EXACTLY_ONCE has no
  *    transactional producer in Spark — route through an idempotent
  *    downstream key or a foreachBatch WAL (Sinks.walBatchWriter), per
  *    the K8 consistency matrix
  *  - event-time → message timestamp: include a `timestamp` column
  */
object Kafka {

  /** Streaming read of `topics`. `startingOffsets`: "earliest", "latest",
    * or a per-partition JSON map — the reference's start positions. */
  def source(spark: SparkSession, bootstrap: String, topics: String,
             startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load()
      // The reference consumes typed records; Kafka hands us bytes.
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "topic", "partition", "offset", "timestamp")

  /** At-least-once sink to `topic`. The frame must carry a `value` column
    * (and optionally `key`); a `timestamp` column propagates event time to
    * the message, the reference's K2 timestamp passthrough. */
  def sink(df: DataFrame, bootstrap: String, topic: String,
           checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}
