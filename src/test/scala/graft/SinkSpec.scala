package graft

import java.io.File

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.TxnFileSink
import graft.streaming.Model._
import graft.streaming.Sinks

/** Sink family tests: K5 ForeachWriter lifecycle, K6 WAL idempotence,
  * K4 keyed upsert, K7 transactional replay, E8 late-data demux.
  */
class SinkSpec extends SparkTestBase {

  private def ev(s: String, id: Long, tsMs: Long, v: Double) =
    SensorEvent(s, id, tsMs * 1000, v)

  test("K5: ForeachWriter open/process/close writes every record exactly once per epoch") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SensorEvent]
    val dir = tmpDir("foreach_sink")
    val input = MemoryStream[SensorEvent]
    val q = input.toDS().toDF().writeStream
      .foreach(new Sinks.LineFileForeachWriter(dir))
      .option("checkpointLocation", tmpDir("ckpt_fe")).start()
    try {
      input.addData(ev("a", 1, 0, 1.5), ev("b", 2, 1, 2.5))
      q.processAllAvailable()
      input.addData(ev("c", 3, 2, 3.5))
      q.processAllAvailable()
    } finally q.stop()
    val lines = new File(dir).listFiles().flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.length == 3)
    assert(lines.exists(_.startsWith("a,")) && lines.exists(_.startsWith("c,")))
  }

  test("K6/K7: WAL foreachBatch is idempotent under batch replay") {
    import spark.implicits._
    val root = tmpDir("wal_sink") + "/out"
    val writer = Sinks.walBatchWriter(root)
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    writer(df, 7L)
    writer(df, 7L) // replayed epoch: must be a no-op
    writer(df.withColumn("id", col("id") + 10), 8L)
    val back = spark.read.parquet(s"$root/batch=*")
    assert(back.count() == 4) // 2 rows per committed batch, no duplicates
    assert(spark.read.parquet(s"$root/batch=7").count() == 2)
  }

  test("K4: keyed-upsert sink keeps latest version per key and is replay-safe") {
    import spark.implicits._
    val root = tmpDir("upsert_sink") + "/tbl"
    val upsert = Sinks.keyedUpsert(root, "k", "ver") _
    upsert(Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ver", "v"), 0L)
    upsert(Seq(("b", 2L, 21.0), ("c", 2L, 30.0)).toDF("k", "ver", "v"), 1L)
    upsert(Seq(("b", 2L, 21.0), ("c", 2L, 30.0)).toDF("k", "ver", "v"), 1L) // replay
    val cur = Sinks.currentVersionDir(spark, root).get
    val rows = spark.read.parquet(cur).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("a", 1L, 10.0), ("b", 2L, 21.0), ("c", 2L, 30.0)))
  }

  test("E8: late-data demux splits rows below the carried high-water mark") {
    import spark.implicits._
    val base = tmpDir("demux")
    val (mainRoot, lateRoot) = (s"$base/main", s"$base/late")
    val demux = Sinks.lateDemux(mainRoot, lateRoot, "ts_ms", latenessMs = 5000L) _
    demux(Seq((1L, 100000L), (2L, 101000L)).toDF("id", "ts_ms"), 0L)
    // Batch 1: ts=10 is far below 101000−5000 → late; ts=200000 on time.
    demux(Seq((3L, 10L), (4L, 200000L)).toDF("id", "ts_ms"), 1L)
    val mainIds = spark.read.parquet(s"$mainRoot/batch=*").select("id")
      .collect().map(_.getLong(0)).toSet
    val lateIds = spark.read.parquet(s"$lateRoot/batch=*").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(mainIds == Set(1L, 2L, 4L))
    assert(lateIds == Set(3L))
  }

  test("K7: TxnFileSink concurrent-commit race leaves exactly one copy") {
    import spark.implicits._
    val root = tmpDir("txn_race") + "/out"
    val df = Seq(1, 2, 3).toDF("n")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 4).map(_ => new Thread(() => results.add(TxnFileSink.commit(df, root, 99L))))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.toArray.count(_ == java.lang.Boolean.TRUE) == 1) // exactly one writer won
    assert(spark.read.parquet(s"$root/batch=99").count() == 3)
  }
}
