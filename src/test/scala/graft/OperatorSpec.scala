package graft

import scala.concurrent.{ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{AsyncMap, Partitioning}
import graft.streaming.Model._
import graft.streaming.Processors.CustomTriggerWindowProcessor
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Operator-level tests: S6 custom DSv2 source, P1–P6 plan shapes,
  * F13 async map, W8/W9/W10 custom window machinery, F11 state reads.
  */
class OperatorSpec extends SparkTestBase {

  test("S6: CounterSource emits a gap-free monotonic sequence across micro-batches") {
    val q = spark.readStream
      .format("graft.sources.CounterSource")
      .option("rowsPerBatch", "500")
      .option("maxRows", "2000")
      .load()
      .writeStream.format("memory").queryName("counter")
      .option("checkpointLocation", tmpDir("ckpt_counter"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val ns = spark.table("counter").collect().map(_.getLong(0)).sorted
    assert(ns.length == 2000)
    assert(ns.head == 1L)
    assert(ns.toSeq == (1L to 2000L)) // gap-free, duplicate-free
  }

  test("S6: CounterSource resumes from the checkpointed offset after restart") {
    val ckpt = tmpDir("ckpt_counter_restart")
    val out = tmpDir("counter_restart_out")
    def runOnce(maxRows: Long): Unit = {
      val q = spark.readStream
        .format("graft.sources.CounterSource")
        .option("rowsPerBatch", "250")
        .option("maxRows", maxRows.toString)
        .load()
        .writeStream
        .foreachBatch(graft.streaming.Sinks.walBatchWriter(out))
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(maxRows = 1000) // run 1: counts 1..1000, then kill
    runOnce(maxRows = 2000) // run 2: fresh stream object, same checkpoint
    val ns = spark.read.parquet(s"$out/batch=*").collect().map(_.getLong(0)).sorted
    // The restarted stream must resume at 1001 — not rewind and re-emit.
    assert(ns.toSeq == (1L to 2000L))
  }

  test("P1-P6: partitioning wrappers produce the declared exchanges") {
    import spark.implicits._
    val df = (1 to 100).toDF("n")
    assert(Partitioning.shuffle(df, 7).rdd.getNumPartitions == 7)
    assert(Partitioning.rebalance(df, 3).rdd.getNumPartitions == 3)
    // rescale is narrow: Coalesce adds NO exchange beyond the upstream
    // repartition's own (exactly one Exchange in the plan).
    val rescaled = Partitioning.rescale(df.repartition(8), 2)
    assert(rescaled.rdd.getNumPartitions == 2)
    val plan = rescaled.queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce") &&
      "Exchange".r.findAllIn(plan).size == 1)
    assert(Partitioning.global(df).rdd.getNumPartitions == 1)
    val byKey = Partitioning.partitionCustom(df, 5, col("n"))
    assert(byKey.rdd.getNumPartitions == 5)
    assert(byKey.queryExecution.executedPlan.toString.contains("hashpartitioning"))
    val byRange = Partitioning.partitionByRange(df, 4, col("n"))
    assert(byRange.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    // broadcast hint survives into a join plan.
    val joined = df.join(Partitioning.broadcastAll(df.limit(5)), "n")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("F13: orderedAsyncMap preserves order with bounded concurrency") {
    import spark.implicits._
    implicit val ecf: () => ExecutionContext = () => ExecutionContext.global
    val ds = spark.range(0, 1000).as[Long].repartition(4)
    val out = AsyncMap.orderedAsyncMap(ds, maxInFlight = 8, timeout = 30.seconds) { n =>
      Future { if (n % 97 == 0) Thread.sleep(5); n * 2 }(ExecutionContext.global)
    }
    val got = out.collect().sorted
    assert(got.toSeq == (0L until 1000L).map(_ * 2))
  }

  test("W8/W9/W10: global window with count trigger and evictor fires and purges") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    implicit val out = Encoders.product[CountWindowRow]
    val input = MemoryStream[SensorEvent]
    val windows = input.toDS()
      .groupByKey(_.sensor_id)(Encoders.STRING)
      .transformWithState(new CustomTriggerWindowProcessor(fireEvery = 3, evictBelow = 0.0),
        TimeMode.None(), OutputMode.Update())
    val q = windows.writeStream.format("memory").queryName("trigger_win")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_tw")).start()
    try {
      // Fire 1: values (1, -5, 4) → evict -5 → kept 2, avg 2.5.
      input.addData(
        SensorEvent("k", 1, 1000, 1.0), SensorEvent("k", 2, 2000, -5.0),
        SensorEvent("k", 3, 3000, 4.0))
      q.processAllAvailable()
      // Fire 2 spans batches: (7) then (-1, 10) → kept (7, 10), avg 8.5.
      input.addData(SensorEvent("k", 4, 4000, 7.0))
      q.processAllAvailable()
      input.addData(SensorEvent("k", 5, 5000, -1.0), SensorEvent("k", 6, 6000, 10.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trigger_win").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((0L, 2L, 2.5), (1L, 2L, 8.5)))
  }

  test("F11: state store data source reads live processor state offline") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val ckpt = tmpDir("ckpt_statereader")
    val input = MemoryStream[SensorEvent]
    val alerts = graft.streaming.Pipelines.deltaAlerts(input.toDS())
    val q = alerts.writeStream.format("memory").queryName("sr_alerts")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(SensorEvent("a", 1, 1000, 10.0), SensorEvent("a", 2, 2000, 20.0),
        SensorEvent("b", 3, 3000, 7.0))
      q.processAllAvailable()
    } finally q.stop()
    // The reference exposes keyed state to external readers via queryable
    // state (정리/5주차.md:170-186); Spark's rendering is the offline
    // statestore data source over the checkpoint.
    val state = spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "lastValue")
      .load()
    val byKey = state.selectExpr("key.value AS k", "value.value AS v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(byKey == Map("a" -> 20.0, "b" -> 7.0))
  }
}
