package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.CoreQueries
import graft.sources.Tables
import graft.streaming.Model._
import graft.streaming.Pipelines

/** MemoryStream scenario tests for the transformWithState processors: each
  * streaming pipeline must reproduce its batch twin's CORRECTNESS-gated
  * result on the same sf0.01 data (VERDICT round 1, task #2).
  */
class StatefulProcessorSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  /** sf0.01 sensor events in global (ts_us, event_id) order, chunked so the
    * stream sees several micro-batches. */
  private lazy val orderedChunks: Seq[Seq[SensorEvent]] = {
    val rows = Tables.sensorReadings(spark, dir)
      .select("sensor_id", "event_id", "ts_us", "value")
      .collect()
      .map(r => SensorEvent(r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(e => (e.ts_us, e.event_id))
      .toSeq
    rows.grouped(math.max(1, rows.size / 4 + 1)).toSeq
  }

  test("F4: DeltaAlertProcessor over MemoryStream reproduces q08 (9587 alerts on sf0.01)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val alerts = Pipelines.deltaAlerts(input.toDS())
    val q = alerts.writeStream.format("memory").queryName("delta_alerts")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_delta")).start()
    try {
      orderedChunks.foreach { chunk => input.addData(chunk); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.table("delta_alerts").collect()
      .map(r => (r.getString(0), r.getLong(1), round9(r.getDouble(2)), round9(r.getDouble(3))))
      .toSet
    val batch = CoreQueries.q08(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), round9(r.getDouble(2)), round9(r.getDouble(3))))
      .toSet
    assert(batch.size == 9587)
    assert(streamed == batch)
  }

  test("W12: CountWindowProcessor over MemoryStream reproduces q13 (1038 groups on sf0.01)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val windows = Pipelines.countWindows(input.toDS(), n = 10)
    val q = windows.writeStream.format("memory").queryName("count_windows")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_cw")).start()
    try {
      orderedChunks.foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      // Unbounded streams never end; flush partial tail groups explicitly.
      val sensors = orderedChunks.flatten.map(_.sensor_id).distinct
      input.addData(sensors.map(s => SensorEvent(s, -1L, Long.MaxValue, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("count_windows").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), round9(r.getDouble(3))))
      .toSet
    val batch = CoreQueries.q13(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), round9(r.getDouble(3))))
      .toSet
    assert(batch.size == 1038)
    assert(streamed == batch)
  }

  test("A2: RollingMaxProcessor emits per event and converges to q02's final state") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val smallDir = "/root/testdata/sf0.001"
    val rows = Tables.sensorReadings(spark, smallDir)
      .select("sensor_id", "event_id", "ts_us", "value").collect()
      .map(r => SensorEvent(r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(e => (e.ts_us, e.event_id)).toSeq
    val input = MemoryStream[SensorEvent]
    val out = Pipelines.rollingMax(input.toDS())
    val q = out.writeStream.format("memory").queryName("rolling_max")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_rm")).start()
    try { input.addData(rows); q.processAllAvailable() } finally q.stop()

    val emitted = spark.table("rolling_max").collect()
    // Per-event emission: exactly one output row per input row (A2's
    // Update-mode contract the batch twin can only approximate).
    assert(emitted.length == rows.size)
    // Final state per key must equal the q02 batch twin.
    val batch = CoreQueries.q02(spark, smallDir).collect()
      .map(r => (r.getString(0), r.getLong(1), round9(r.getDouble(2)))).toSet
    val streamedFinal = emitted.groupBy(_.getString(0)).map { case (k, rs) =>
      val best = rs.map(r => (r.getLong(1), r.getDouble(2)))
        .maxBy { case (id, v) => (v, -id) }
      (k, best._1, round9(best._2))
    }.toSet
    assert(streamedFinal == batch)
  }

  test("M2: LatestControlProcessor alerts iff latest control is HIGH and value > threshold") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    implicit val ctrlEnc = Encoders.product[(Long, String)]
    val dataIn = MemoryStream[SensorEvent]
    val ctrlIn = MemoryStream[(Long, String)]
    val keys = Seq("s1", "s2")
    val alerts = Pipelines.controlAlerts(dataIn.toDS(), ctrlIn.toDS(), keys, threshold = 100.0)
    val q = alerts.writeStream.format("memory").queryName("ctrl_alerts")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_ctrl")).start()
    try {
      // Batch 1: control LOW at t=0; hot reading at t=1000 → no alert.
      ctrlIn.addData((0L, "LOW")); dataIn.addData(SensorEvent("s1", 1, 1000, 150.0))
      q.processAllAvailable()
      // Batch 2: control HIGH at t=2000; hot reading s1 t=3000 → alert;
      // cool reading s2 t=3000 → no alert.
      ctrlIn.addData((2000L, "HIGH"))
      dataIn.addData(SensorEvent("s1", 2, 3000, 150.0), SensorEvent("s2", 3, 3000, 50.0))
      q.processAllAvailable()
      // Batch 3: control back LOW at t=4000; hot reading → no alert.
      ctrlIn.addData((4000L, "LOW")); dataIn.addData(SensorEvent("s1", 4, 5000, 200.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ctrl_alerts").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("s1", 3L)))
  }

  test("F6: MapWindowCountsProcessor holds concurrent windows in MapState") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val out = Pipelines.mapWindowCounts(
      Pipelines.withEventTime(input.toDS(), "0 seconds"), windowMs = 5000L)
    val q = out.writeStream.format("memory").queryName("map_windows")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_mw")).start()
    try {
      // One batch, three windows per key OPEN AT ONCE and interleaved —
      // the shape a single ValueState cannot hold.
      input.addData(
        SensorEvent("a", 1, 1_000_000L, 10.0), // window end 5000
        SensorEvent("a", 2, 6_000_000L, 20.0), // window end 10000
        SensorEvent("a", 3, 2_000_000L, 30.0), // reopens 5000
        SensorEvent("b", 4, 11_000_000L, 40.0), // window end 15000
        SensorEvent("a", 5, 12_000_000L, 50.0)) // window end 15000
      q.processAllAvailable()
      input.addData(SensorEvent("a", 99, 1L << 50, 0.0)) // watermark closer
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("map_windows").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), round9(r.getDouble(3)))).toSet
    val expected = Set(
      ("a", 5000L, 2L, 20.0),  // events 1+3
      ("a", 10000L, 1L, 20.0), // event 2
      ("a", 15000L, 1L, 50.0), // event 5
      ("b", 15000L, 1L, 40.0)) // event 4
    assert(got == expected)
  }

  test("F10: TtlDedupProcessor keeps first occurrence per event_id") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    // Processing-time state (TTL) makes the engine self-trigger batches to
    // advance time; AvailableNow bounds the run for the test.
    input.addData(
      SensorEvent("a", 1, 100, 1.0), SensorEvent("a", 1, 100, 1.0),
      SensorEvent("b", 2, 200, 2.0))
    input.addData(SensorEvent("a", 1, 100, 1.0), SensorEvent("c", 3, 300, 3.0))
    val out = Pipelines.dedupWithTtl(input.toDS(), java.time.Duration.ofMinutes(10))
    val q = out.writeStream.format("memory").queryName("ttl_dedup")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_ttl"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000L) finally q.stop()
    val ids = spark.table("ttl_dedup").collect().map(_.getLong(1)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)))
  }
}
