package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Model._
import graft.streaming.Pipelines

/** Event-time / watermark semantics (E1, E2, E6, W4, W7, F2): late-row
  * dropping, session-gap merging, and timer firing, driven by explicit
  * watermark advancement through MemoryStream batches.
  */
class WatermarkSpec extends SparkTestBase {

  private def ev(s: String, id: Long, tsMs: Long, v: Double) =
    SensorEvent(s, id, tsMs * 1000, v)

  test("E1/E6: windowed agg drops rows older than watermark (5 s bound)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val counts = Pipelines.withEventTime(input.toDS(), "5 seconds")
      .groupBy(col("sensor_id"), window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("sensor_id"), unix_millis(col("window.end")).as("end_ms"), col("cnt"))
    val q = counts.writeStream.format("memory").queryName("wm_counts")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_wm")).start()
    try {
      // Window [0,10s): two on-time rows. Watermark after batch = 8−5 = 3 s.
      input.addData(ev("a", 1, 1000, 1), ev("a", 2, 8000, 1))
      q.processAllAvailable()
      // Advance watermark to 30−5 = 25 s → window [0,10s) closes with cnt=2.
      input.addData(ev("a", 3, 30000, 1))
      q.processAllAvailable()
      // ts=2 s is far below watermark 25 s → dropped, no reopened window.
      input.addData(ev("a", 4, 2000, 99))
      q.processAllAvailable()
      // Close the [30,40s) window too.
      input.addData(ev("a", 5, 60000, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wm_counts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 10000L, 2L), ("a", 40000L, 1L)))
  }

  test("W4: session windows merge across a gap < 1 minute and split beyond it") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val sessions = Pipelines.withEventTime(input.toDS(), "0 seconds")
      .groupBy(col("sensor_id"), session_window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("sensor_id"), unix_millis(col("session_window.start")).as("start_ms"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_sess")).start()
    try {
      // Three events 30 s apart chain into ONE session (each gap < 1 min,
      // merging extends it — 정리/4주차.md:181-183); then a 2-minute gap
      // starts a second session.
      input.addData(ev("u", 1, 0, 1), ev("u", 2, 30000, 1), ev("u", 3, 60000, 1))
      input.addData(ev("u", 4, 180000, 1))
      q.processAllAvailable()
      // Push the watermark far ahead so both sessions close.
      input.addData(ev("u", 5, 600000, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 3L), (180000L, 1L)))
  }

  test("F2/F3: TempIncreaseAlertProcessor fires on sustained rise, cancels on drop") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val alerts = Pipelines.tempIncreaseAlerts(
      Pipelines.withEventTime(input.toDS(), "0 seconds"), horizonMs = 1000L)
    val q = alerts.writeStream.format("memory").queryName("rise_alerts")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_rise")).start()
    try {
      // "riser": 10 → 11 at t=100 ms registers a timer at 1100 ms and never
      // drops → timer fires once the watermark passes 1100 ms.
      // "dipper": rises at t=100 ms (timer at 1100 ms) but drops at t=500 ms
      // → timer deleted, no alert.
      input.addData(
        ev("riser", 1, 0, 10), ev("riser", 2, 100, 11), ev("riser", 3, 800, 12),
        ev("dipper", 4, 0, 10), ev("dipper", 5, 100, 11), ev("dipper", 6, 500, 9))
      q.processAllAvailable()
      input.addData(ev("other", 7, 5000, 1)) // watermark → 5000 ms
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("rise_alerts").collect().map(_.getString(0)).toSet
    assert(got == Set("riser"))
  }

  test("W7: WindowMedianProcessor emits exact per-window medians at watermark") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val medians = Pipelines.medianPerWindow(
      Pipelines.withEventTime(input.toDS(), "0 seconds"), windowMs = 10000L)
    val q = medians.writeStream.format("memory").queryName("medians")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_med")).start()
    try {
      // Window (…,10s]: values 5,1,9 → median 5. Window (10s,20s]: 2,4 → 3.
      input.addData(ev("m", 1, 1000, 5), ev("m", 2, 2000, 1), ev("m", 3, 3000, 9),
        ev("m", 4, 11000, 2), ev("m", 5, 12000, 4))
      q.processAllAvailable()
      input.addData(ev("m", 6, 60000, 0)) // advance watermark past both ends
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("medians").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.contains((10000L, 3L, 5.0)) && got.contains((20000L, 2L, 3.0)))
  }

  test("E9: ingestion time stamps arrival time as the event-time column") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[SensorEvent]
    import spark.implicits._
    val before = new java.sql.Timestamp(System.currentTimeMillis() - 60000)
    val stamped = Pipelines.withIngestionTime(
      Seq(SensorEvent("a", 1, 999L, 1.0)).toDS())
    val ts = stamped.toDF().select("ts").head.getTimestamp(0)
    val after = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    assert(ts.after(before) && ts.before(after)) // arrival time, not the 999µs event time
  }

  test("streaming dedup: dropDuplicatesWithinWatermark removes replayed events") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val input = MemoryStream[SensorEvent]
    val deduped = Pipelines.withEventTime(input.toDS(), "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_ddwm")).start()
    try {
      input.addData(ev("a", 1, 1000, 1), ev("a", 1, 1000, 1), ev("b", 2, 2000, 2))
      q.processAllAvailable()
      input.addData(ev("a", 1, 1000, 1), ev("c", 3, 3000, 3)) // replay of id 1
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_wm").collect().map(_.getLong(1)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)))
  }
}
