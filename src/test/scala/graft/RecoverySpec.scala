package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.Sinks

/** F14 — checkpoint/recovery: kill a streaming query mid-stream, restart it
  * against the same checkpoint dir, and prove exactly-once end-to-end
  * counts (reference 정리/6주차.md:25-30: replayable source + transactional
  * sink ⇒ exactly-once; Spark's offset log + idempotent TxnFileSink is that
  * matrix row).
  */
class RecoverySpec extends SparkTestBase {

  test("F14: restart from checkpoint resumes without loss or duplication") {
    val base = tmpDir("recovery")
    val srcDir = s"$base/src"
    val outRoot = s"$base/out"
    val ckpt = s"$base/ckpt"
    new File(srcDir).mkdirs()

    // Replayable file source: the sf0.001 events split into 3 files.
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "value")
    val total = events.count()
    events.where(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$srcDir/p0")
    events.where(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$srcDir/p1")
    events.where(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$srcDir/p2")
    def lodge(i: Int): Unit =
      new File(s"$srcDir/p$i").listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.move(f.toPath, Paths.get(s"$srcDir/in_$i.parquet"),
          StandardCopyOption.ATOMIC_MOVE))
    val schema = events.schema

    def startQuery() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/in_*.parquet")
      .writeStream
      .foreachBatch(Sinks.walBatchWriter(outRoot))
      .option("checkpointLocation", ckpt)
      .start()

    // Run 1: only the first slice is visible; process it, then kill.
    lodge(0)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // Run 2: two more slices appear; restart from the SAME checkpoint.
    lodge(1); lodge(2)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    // Run 3: restart once more with nothing new — must emit nothing.
    val committedAfter2 = new File(outRoot).listFiles().map(_.getName).toSet
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()
    val committedAfter3 = new File(outRoot).listFiles().map(_.getName).toSet

    val replayed = spark.read.parquet(s"$outRoot/batch=*")
    assert(replayed.count() == total) // no loss
    assert(replayed.select("event_id").distinct().count() == total) // no duplication
    assert(committedAfter2 == committedAfter3) // idle restart commits nothing
  }
}
