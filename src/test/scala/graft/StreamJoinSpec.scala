package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Model._
import graft.streaming.Pipelines

/** M5/M6 in true streaming form: stream-stream interval and window joins
  * over two MemoryStreams must emit exactly the pairs the batch join
  * produces on the same rows (the batch twins are gate queries q09/q10;
  * here the STREAMING execution itself — watermark-bounded join state,
  * append-mode emission — is under test).
  */
class StreamJoinSpec extends SparkTestBase {

  private def feedBoth(lRows: Seq[SensorEvent], rRows: Seq[SensorEvent],
                       build: (org.apache.spark.sql.Dataset[SensorEvent],
                               org.apache.spark.sql.Dataset[SensorEvent]) =>
                              org.apache.spark.sql.DataFrame,
                       name: String): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val lIn = MemoryStream[SensorEvent]
    val rIn = MemoryStream[SensorEvent]
    val q = build(lIn.toDS(), rIn.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
    try {
      lIn.addData(lRows); rIn.addData(rRows)
      q.processAllAvailable()
      // Far-future rows push both watermarks past every buffered row so
      // all joinable pairs are emitted and state is evicted.
      lIn.addData(SensorEvent("zz", -1, 1L << 50, 0.0))
      rIn.addData(SensorEvent("zz", -2, (1L << 50) + 1, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).where(col("sensor_id") =!= "zz").collect()
  }

  test("M5 streaming: interval join emits exactly the batch pairs") {
    val l = Seq(
      SensorEvent("a", 1, 10_000_000L, 1.0), SensorEvent("a", 2, 30_000_000L, 2.0),
      SensorEvent("b", 3, 20_000_000L, 3.0))
    val r = Seq(
      SensorEvent("a", 11, 8_000_000L, 0.0),  // 2s before l1: inside [-5s, +2s]
      SensorEvent("a", 12, 11_500_000L, 0.0), // 1.5s after l1: inside
      SensorEvent("a", 13, 36_000_000L, 0.0), // 6s after l2: outside
      SensorEvent("b", 14, 21_000_000L, 0.0), // 1s after l3: inside
      SensorEvent("c", 15, 10_000_000L, 0.0)) // wrong key
    val got = feedBoth(l, r,
      (ld, rd) => Pipelines.intervalJoin(ld, rd, beforeUs = 5_000_000L, afterUs = 2_000_000L),
      "ssj_interval").map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val expected = Set(("a", 1L, 11L), ("a", 1L, 12L), ("b", 3L, 14L))
    assert(got == expected)
  }

  test("M6 streaming: window join pairs co-windowed events only") {
    val l = Seq(
      SensorEvent("a", 1, 3_000_000L, 1.0),  // window [0,5s)
      SensorEvent("a", 2, 7_000_000L, 2.0))  // window [5s,10s)
    val r = Seq(
      SensorEvent("a", 11, 4_000_000L, 0.0), // [0,5s): pairs with 1
      SensorEvent("a", 12, 9_000_000L, 0.0), // [5s,10s): pairs with 2
      SensorEvent("b", 13, 4_000_000L, 0.0)) // wrong key
    val got = feedBoth(l, r,
      (ld, rd) => Pipelines.windowJoin(ld, rd, "5 seconds"),
      "ssj_window").map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    val expected = Set(("a", 5000L, 1L, 11L), ("a", 10000L, 2L, 12L))
    assert(got == expected)
  }

  test("M5 streaming: matches the batch join on random interleavings") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // +1s floor: the streaming join's watermark starts at epoch 0 and an
    // event at EXACTLY the watermark is dropped as late, so a ts_us=0 row
    // silently loses its pairs — an engine boundary, not a join property.
    val l = (1 to 40).map(i =>
      SensorEvent(s"s${rnd.nextInt(3)}", i.toLong, (rnd.nextInt(60) + 1) * 1_000_000L, 0.0))
    val r = (101 to 160).map(i =>
      SensorEvent(s"s${rnd.nextInt(3)}", i.toLong, (rnd.nextInt(60) + 1) * 1_000_000L, 0.0))
    val got = feedBoth(l, r,
      (ld, rd) => Pipelines.intervalJoin(ld, rd, beforeUs = 4_000_000L, afterUs = 3_000_000L),
      "ssj_rand").map(x => (x.getLong(1), x.getLong(2))).toSet
    val batch = l.toDF().as("l").join(r.toDF().as("r"),
        col("l.sensor_id") === col("r.sensor_id") &&
          col("r.ts_us") >= col("l.ts_us") - 4_000_000L &&
          col("r.ts_us") <= col("l.ts_us") + 3_000_000L)
      .select(col("l.event_id"), col("r.event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    if (got != batch) {
      val lm = l.map(e => e.event_id -> e).toMap; val rm = r.map(e => e.event_id -> e).toMap
      (batch -- got).foreach { case (a, b) => info(s"missing: ${lm(a)} x ${rm(b)}") }
      (got -- batch).foreach { case (a, b) => info(s"extra: ${lm(a)} x ${rm(b)}") }
    }
    assert(got == batch)
  }
}
