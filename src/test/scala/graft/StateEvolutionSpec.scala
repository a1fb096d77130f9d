package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

import graft.streaming.Model._

object StateEvolutionSpec {
  case class StateV1(cnt: Long)
  case class StateV2(cnt: Long, total: Option[Double]) // added nullable field

  /** V1: counts events per key. */
  class CounterV1 extends StatefulProcessor[String, SensorEvent, (String, Long)] {
    @transient private var s: ValueState[StateV1] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      s = getHandle.getValueState[StateV1]("s", Encoders.product[StateV1], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[(String, Long)] = {
      val cnt = (if (s.exists) s.get.cnt else 0L) + rows.size
      s.update(StateV1(cnt))
      Iterator.single((key, cnt))
    }
  }

  /** V2: same state var, evolved schema (new optional running total). */
  class CounterV2 extends StatefulProcessor[String, SensorEvent, (String, Long, Double)] {
    @transient private var s: ValueState[StateV2] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      s = getHandle.getValueState[StateV2]("s", Encoders.product[StateV2], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[SensorEvent],
                                 tv: TimerValues): Iterator[(String, Long, Double)] = {
      val rs = rows.toSeq
      val prev = if (s.exists) s.get else StateV2(0L, None)
      val next = StateV2(prev.cnt + rs.size,
        Some(prev.total.getOrElse(0.0) + rs.map(_.value).sum))
      s.update(next)
      Iterator.single((key, next.cnt, next.total.get))
    }
  }
}

/** F15 — state schema evolution across a restart: a V2 processor with an
  * added nullable state field resumes from a V1 checkpoint (the
  * reference's savepoint upgrade story, 정리/5주차.md:150-169; Spark 4
  * supports it with the Avro state encoding).
  */
class StateEvolutionSpec extends SparkTestBase {
  import StateEvolutionSpec._

  test("F15: V2 processor with an added state field resumes a V1 checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val ckpt = tmpDir("ckpt_evolve")
    val out1 = tmpDir("evolve_out1")
    val out2 = tmpDir("evolve_out2")
    val prevFmt = spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    try {
      // Run 1 — V1 state: two events for key "a". (foreachBatch sink: the
      // memory sink cannot recover from a checkpoint.)
      val in1 = MemoryStream[SensorEvent]
      in1.addData(SensorEvent("a", 1, 1, 10.0), SensorEvent("a", 2, 2, 20.0))
      val q1 = in1.toDS().groupByKey(_.sensor_id)(Encoders.STRING)
        .transformWithState(new CounterV1, TimeMode.None(), OutputMode.Update())(
          Encoders.product[(String, Long)])
        .toDF("key", "cnt")
        .writeStream.foreachBatch(graft.streaming.Sinks.walBatchWriter(out1))
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try q1.processAllAvailable() finally q1.stop()
      val v1 = spark.read.parquet(s"$out1/batch=*").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(v1 == Set(("a", 2L)))

      // Run 2 — V2 state on the SAME checkpoint (and the same source, so
      // its offsets continue past the committed batch): resume at cnt=3.
      in1.addData(SensorEvent("a", 3, 3, 30.0))
      val q2 = in1.toDS().groupByKey(_.sensor_id)(Encoders.STRING)
        .transformWithState(new CounterV2, TimeMode.None(), OutputMode.Update())(
          Encoders.product[(String, Long, Double)])
        .toDF("key", "cnt", "total")
        .writeStream.foreachBatch(graft.streaming.Sinks.walBatchWriter(out2))
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(s"$out2/batch=*").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // cnt carried over from V1 (2+1); the NEW field starts from its
      // default for the restored state (total = None -> 30.0).
      assert(got == Set(("a", 3L, 30.0)))
    } finally {
      prevFmt match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
      }
    }
  }
}
