package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.Model._
import graft.streaming.Pipelines

/** SURVEY §5.3 — stream-vs-batch equivalence property: for arbitrary event
  * sequences, the streaming windowed aggregation (Append mode, windows
  * closed by the watermark) equals the batch groupBy over the same rows —
  * the determinism event time is supposed to buy (정리/4주차.md:7-9).
  * ScalaCheck generators are driven directly with fixed seeds (the
  * scalatest/scalacheck bridge artifact is not in the offline cache).
  */
class EquivalenceSpec extends SparkTestBase {

  private val eventsGen: Gen[List[SensorEvent]] = for {
    n <- Gen.choose(5, 40)
    evs <- Gen.listOfN(n, for {
      sensor <- Gen.oneOf("s0", "s1", "s2")
      tsMs <- Gen.choose(0L, 60000L)
      value <- Gen.choose(-50.0, 150.0)
    } yield (sensor, tsMs, value))
  } yield evs.zipWithIndex.map { case ((s, t, v), i) =>
    SensorEvent(s, i.toLong, t * 1000, v)
  }

  test("session-window property: streaming merge == batch gap-split for random sequences") {
    implicit val enc = Encoders.product[SensorEvent]
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    (1 to 3).foreach { trial =>
      val events = eventsGen.pureApply(Gen.Parameters.default, Seed(100L + trial))
      locally {
        val input = MemoryStream[SensorEvent]
        val name = s"equiv_sess_${System.nanoTime()}"
        val agg = Pipelines.withEventTime(input.toDS(), "0 seconds")
          .groupBy(col("sensor_id"), session_window(col("ts"), "7 seconds"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("sensor_id"), unix_millis(col("session_window.start")).as("start_ms"),
            col("cnt"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", tmpDir("ckpt_eqs")).start()
        try {
          input.addData(events)
          q.processAllAvailable()
          input.addData(SensorEvent("s0", 1L << 40, 1L << 50, 0.0)) // close all
          q.processAllAvailable()
        } finally q.stop()
        val streamed = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

        // Batch twin: classic gap-split with lag() + running session ids.
        val batch = events.toDS()
          .selectExpr("sensor_id", "ts_us div 1000 AS ts_ms")
          .selectExpr("sensor_id", "ts_ms",
            "CASE WHEN lag(ts_ms) OVER (PARTITION BY sensor_id ORDER BY ts_ms) IS NULL " +
              "OR ts_ms - lag(ts_ms) OVER (PARTITION BY sensor_id ORDER BY ts_ms) >= 7000 " +
              "THEN 1 ELSE 0 END AS new_s")
          .selectExpr("sensor_id", "ts_ms",
            "sum(new_s) OVER (PARTITION BY sensor_id ORDER BY ts_ms " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid")
          .groupBy("sensor_id", "sid")
          .agg(min("ts_ms").as("start_ms"), count(lit(1)).as("cnt"))
          .select("sensor_id", "start_ms", "cnt")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(streamed == batch)
      }
    }
  }

  test("co-process property: controlAlerts == q05-shaped batch as-of twin") {
    // Round-2 verdict #8: tie the M2 streaming co-process
    // (Processors.LatestControlProcessor via Pipelines.controlAlerts) to
    // the batch as-of join the q05 gate verifies, on random event/control
    // interleavings. Contract: batches are fed in time order (the
    // processor determinizes within a batch; across batches state carries
    // the latest control), control timestamps are unique (the batch path
    // collapses duplicates by struct-max, which a stream cannot see).
    // Feeding detail: each MemoryStream addData block becomes its OWN
    // micro-batch in call order, so a mixed round would apply all its
    // controls before all its data regardless of timestamps; the harness
    // therefore feeds maximal same-kind runs in global (ts, ctrl-first)
    // order — the arrival sequence a time-ordered transport delivers.
    implicit val enc = Encoders.product[SensorEvent]
    implicit val ctrlEnc = Encoders.product[(Long, String)]
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val keys = Seq("s0", "s1", "s2")
    val interleavingGen = for {
      nEv <- Gen.choose(10, 60)
      nCt <- Gen.choose(1, 15)
      evs <- Gen.listOfN(nEv, for {
        sensor <- Gen.oneOf(keys)
        tsUs <- Gen.choose(0L, 100000L)
        value <- Gen.choose(50.0, 150.0)
      } yield (sensor, tsUs, value))
      cts <- Gen.listOfN(nCt, Gen.zip(Gen.choose(0L, 100000L), Gen.oneOf("HIGH", "LOW")))
    } yield (evs.zipWithIndex.map { case ((s, t, v), i) => SensorEvent(s, i.toLong, t, v) },
      cts.distinctBy(_._1))

    (1 to 3).foreach { trial =>
      val (events, controls) = interleavingGen.pureApply(Gen.Parameters.default, Seed(40L + trial))
      locally {
        val dataIn = MemoryStream[SensorEvent]
        val ctrlIn = MemoryStream[(Long, String)]
        val name = s"equiv_ctrl_${System.nanoTime()}"
        val alerts = Pipelines.controlAlerts(dataIn.toDS(), ctrlIn.toDS(), keys, threshold = 100.0)
        val q = alerts.writeStream.format("memory").queryName(name)
          .outputMode("update").option("checkpointLocation", tmpDir("ckpt_eqc")).start()
        try {
          // Global (ts, ctrl-first) order, chunked into maximal
          // same-kind runs; one addData (= one micro-batch) per run.
          val tagged: Seq[(Long, Int, Either[(Long, String), SensorEvent])] =
            controls.map(c => (c._1, 0, Left(c))) ++ events.map(e => (e.ts_us, 1, Right(e)))
          val runs = tagged.sortBy(t => (t._1, t._2)).foldLeft(List.empty[List[(Long, Int, Either[(Long, String), SensorEvent])]]) {
            case (acc @ (run :: rest), item) if run.head._2 == item._2 => (item :: run) :: rest
            case (acc, item) => List(item) :: acc
          }.reverse.map(_.reverse)
          runs.foreach { run =>
            if (run.head._2 == 0) ctrlIn.addData(run.map(_._3.swap.getOrElse(sys.error("ctrl"))))
            else dataIn.addData(run.map(_._3.getOrElse(sys.error("data"))))
            q.processAllAvailable()
          }
        } finally q.stop()
        val streamed = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), round9(r.getDouble(2)))).toSeq.sorted

        val readings = events.toDF()
          .where(col("value") > 100.0)
          .select("event_id", "sensor_id", "ts_us", "value")
        val control = controls.toDF("ts_us", "level")
        val batch = graft.operators.AsOfJoin.latestAtOrBefore(readings, control, "ts_us")
          .where(col("level") === "HIGH")
          .select(col("sensor_id"), expr("ts_us div 1000").as("ts_ms"), col("value"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), round9(r.getDouble(2)))).toSeq.sorted
        if (streamed != batch) {
          info(s"controls: ${controls.sortBy(_._1)}")
          info(s"hot events: ${events.filter(_.value > 100).sortBy(_.ts_us).map(e => (e.sensor_id, e.ts_us, e.value))}")
        }
        assert(streamed == batch, s"trial $trial: co-process diverges from batch as-of")
      }
    }
  }

  test("q04 window-average property: streaming == batch for random sequences") {
    implicit val enc = Encoders.product[SensorEvent]
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val events = eventsGen.pureApply(Gen.Parameters.default, Seed(trial.toLong))
      locally {
        val input = MemoryStream[SensorEvent]
        val name = s"equiv_${System.nanoTime()}"
        val agg = Pipelines.withEventTime(input.toDS(), "0 seconds")
          .groupBy(col("sensor_id"), window(col("ts"), "5 seconds"))
          .agg(count(lit(1)).as("cnt"), sum(floor(col("value") * 1e6 + 0.5)).as("s"))
          .select(col("sensor_id"), unix_millis(col("window.end")).as("end_ms"),
            col("cnt"), col("s"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", tmpDir("ckpt_eq")).start()
        try {
          input.addData(events)
          q.processAllAvailable()
          // A far-future row closes every window the events opened.
          input.addData(SensorEvent("s0", 1L << 40, 1L << 50, 0.0))
          q.processAllAvailable()
        } finally q.stop()

        val streamed = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val batch = events.toDS()
          .groupBy(col("sensor_id"), window(timestamp_micros(col("ts_us")), "5 seconds"))
          .agg(count(lit(1)).as("cnt"), sum(floor(col("value") * 1e6 + 0.5)).as("s"))
          .select(col("sensor_id"), unix_millis(col("window.end")), col("cnt"), col("s"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(streamed == batch)
      }
    }
  }
}
