package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The multimodal decode boundary (builder brief: image/audio/video as
  * opaque BINARY + typed metadata, decode as a partition-parallel batch
  * step; this container ships no codecs, so the decode itself is a
  * deterministic stub).
  *
  * Two renderings of the same contract, proven equivalent by
  * MultimodalCodecSpec:
  *
  *  - [[decodeColumnar]] — the stub's outputs (payload length, first
  *    byte) ARE computable relationally, so the default path keeps them
  *    as codegen'd Catalyst expressions: no typed deserialization, the
  *    whole plan stays inside WholeStageCodegen (round-2 verdict #4: the
  *    row-at-a-time typed deser made qx11 the slowest query at 7.45 s for
  *    pure plumbing reasons).
  *  - [[decodeTyped]] — the escape hatch a REAL codec needs: a typed
  *    mapPartitions over (id, type, k, payload) where a JNI/FFM decoder
  *    would process the partition's payloads batch-wise (one codec
  *    instance per partition, amortized init — the mapInPandas shape of
  *    the brief, rendered JVM-native). This costs one
  *    deserialize/serialize fence around the decode — the price of
  *    leaving Catalyst, paid only when real out-of-engine work happens.
  */
object MultimodalCodec {

  /** media must carry (event_id, event_type, k, payload BINARY); appends
    * payload_len + first_byte without leaving codegen. */
  def decodeColumnar(media: DataFrame): DataFrame =
    media
      .withColumn("payload_len", length(col("payload")).cast("long"))
      // First byte as unsigned int: 1-byte binary slice → hex → base-16.
      .withColumn("first_byte", expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS BIGINT)"))
      .drop("payload")

  /** Same contract through the typed codec slot. A real decoder replaces
    * the body of the map — everything around it (schema, partition
    * parallelism, batch shape) is the load-bearing plumbing. */
  def decodeTyped(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("event_id"), col("event_type"), col("k"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        // DECODE STUB — deterministic fake: a real implementation would
        // decode image/audio here (batch-wise, one codec per partition).
        rows.map { case (id, tpe, k, payload) =>
          (id, tpe, k, payload.length.toLong, (payload(0) & 0xff).toLong)
        }
      }
      .toDF("event_id", "event_type", "k", "payload_len", "first_byte")
  }
}
