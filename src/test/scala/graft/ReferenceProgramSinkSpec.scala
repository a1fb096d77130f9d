package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.ReferencePrograms

/** r9 verdict #9: the five reference mains ran console-sink only, so a
  * testdata/source drift could silently break them between live runs.
  * This spec drives `basic` and `multi` — the two that exercise the
  * rate-backed sources — through FILE sinks for a bounded wall-clock
  * window and asserts the committed row SHAPES, keeping the programs
  * executable-by-construction. `basic` appends to a parquet file sink
  * (stateless plan → native append); `multi` commits per-batch
  * snapshots via foreachBatch (its update-mode alert stream cannot use
  * the append-only file sink — the same K6 discipline the door uses). */
class ReferenceProgramSinkSpec extends SparkTestBase {

  test("basic writes split tokens to a parquet sink with the declared shape") {
    val out = tmpDir("ref_basic_out")
    val q = ReferencePrograms.basicPipeline(spark)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("ref_basic_ck"))
      .start()
    try {
      // rate source at 100 ev/s: a few seconds is thousands of rows
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
             !Files.list(Paths.get(out)).anyMatch(p => p.toString.endsWith(".parquet")))
        Thread.sleep(250)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.schema.map(f => (f.name, f.dataType.typeName)) == Seq("token" -> "string"))
    val n = rows.count()
    assert(n > 0, "the basic program committed no rows")
    // flatMap split on "_": tokens are exactly the two halves of
    // sensor_<i>, and the filter(value >= 25) kept only warm readings.
    val toks = rows.select("token").distinct().collect().map(_.getString(0)).toSet
    assert(toks.subsetOf((0 until 10).map(_.toString).toSet + "sensor"),
      s"unexpected tokens: ${toks -- ((0 until 10).map(_.toString).toSet + "sensor")}")
    assert(toks.contains("sensor"), "every split yields the 'sensor' half")
  }

  test("multi commits alert snapshots with the declared shape and semantics") {
    val out = tmpDir("ref_multi_out")
    // threshold low enough that the seeded random walk alerts whenever
    // the control level is HIGH — the spec needs committed rows, not luck
    val q = ReferencePrograms.multiPipeline(spark, threshold = -1000.0)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", tmpDir("ref_multi_ck"))
      .start()
    try {
      val deadline = System.nanoTime() + 25L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
             (!Files.exists(Paths.get(out)) || !Files.list(Paths.get(out)).findAny().isPresent))
        Thread.sleep(250)
      q.processAllAvailable()
    } finally q.stop()
    assert(Files.exists(Paths.get(out)), "the multi program committed no alert batches")
    val rows = spark.read.parquet(s"$out/batch=*")
    assert(rows.schema.map(_.name) == Seq("sensor_id", "ts_ms", "value", "message"))
    assert(rows.count() > 0, "no alerts committed")
    assert(rows.where(!col("sensor_id").startsWith("sensor_")).count() == 0)
    assert(rows.where(col("message") =!= "Risk of fire").count() == 0,
      "alerts must carry the reference's alert text")
  }
}
