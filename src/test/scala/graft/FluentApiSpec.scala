package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.api.GraftStream
import graft.streaming.Model._

/** The fluent DataStream-style surface: the reference's program chains
  * written verbatim against GraftStream must behave like the reference
  * programs (BasicTransformations and KeyedTransformations shapes).
  */
class FluentApiSpec extends SparkTestBase {

  test("basic chain: filter -> map -> flatMap over a live stream (T1/T3/T6)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    implicit val str = Encoders.STRING
    val input = MemoryStream[SensorEvent]
    val tokens = GraftStream.from(input.toDS())
      .filter(_.value >= 25)
      .map(_.sensor_id)
      .flatMap(_.split("_").toSeq)
    val q = tokens.ds.writeStream.format("memory").queryName("fluent_basic")
      .option("checkpointLocation", tmpDir("ckpt_fluent_b")).start()
    try {
      input.addData(
        SensorEvent("sensor_1", 1, 1, 30.0), // passes: tokens sensor, 1
        SensorEvent("sensor_2", 2, 2, 10.0)) // filtered out
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fluent_basic").collect().map(_.getString(0)).sorted
    assert(got.sameElements(Array("1", "sensor")))
  }

  test("keyed chain: keyBy -> reduce emits the running max per event (A1/A2)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    implicit val str = Encoders.STRING
    val input = MemoryStream[SensorEvent]
    val maxes = GraftStream.from(input.toDS())
      .keyBy(_.sensor_id)
      .reduce((a, b) => if (b.value > a.value) b else a)
    val q = maxes.ds.writeStream.format("memory").queryName("fluent_keyed")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_fluent_k")).start()
    try {
      input.addData(SensorEvent("s", 1, 1, 10.0))
      q.processAllAvailable()
      input.addData(SensorEvent("s", 2, 2, 5.0)) // lower: emits the OLD max again
      q.processAllAvailable()
      input.addData(SensorEvent("s", 3, 3, 20.0)) // new max
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("fluent_keyed").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    // One emission per input event (reference reduce semantics), with the
    // running max at each point: (1,10), (1,10), (3,20).
    assert(emitted.length == 3)
    assert(emitted.map(_._2).sorted.sameElements(Array(10.0, 10.0, 20.0)))
    assert(emitted.count(_._1 == 1L) == 2 && emitted.count(_._1 == 3L) == 1)
  }

  test("fromElements + union over batch datasets (S3/M1)") {
    implicit val lng = Encoders.scalaLong
    val a = GraftStream.fromElements(spark, 1L, 2L)
    val b = GraftStream.fromElements(spark, 2L, 3L)
    val u = a.union(b).ds.collect().sorted
    assert(u.sameElements(Array(1L, 2L, 2L, 3L))) // FIFO merge, no dedup
  }
  test("intervalJoin chain: keyed range join emits typed pairs (M5 fluent)") {
    implicit val enc = Encoders.product[SensorEvent]
    // Batch form of the same verb (stream form proven in StreamJoinSpec).
    val left = GraftStream.fromElements(spark,
      SensorEvent("a", 1, 10_000_000L, 1.0), SensorEvent("b", 2, 20_000_000L, 2.0))
      .assignTimestampsAndWatermarks("ts_us", "0 seconds")
    val right = GraftStream.fromElements(spark,
      SensorEvent("a", 11, 8_000_000L, 0.0),  // -2s from l1: inside [-5s, 2s]
      SensorEvent("a", 12, 13_000_000L, 0.0), // +3s: outside
      SensorEvent("b", 13, 21_000_000L, 0.0)) // +1s from l2: inside
      .assignTimestampsAndWatermarks("ts_us", "0 seconds")
    val pairs = left.intervalJoin(right, "sensor_id", "ts", lowerMs = -5000L, upperMs = 2000L)
      .map { case (l, r) => (l.event_id, r.event_id) }(Encoders.product[(Long, Long)])
    assert(pairs.ds.collect().toSet == Set((1L, 11L), (2L, 13L)))
  }
}
