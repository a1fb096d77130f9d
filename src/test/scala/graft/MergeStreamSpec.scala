package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MergeStream
import graft.streaming.MergeStream.MergeOp

/** Streaming CDC merge ([[MergeStream]]) — the online qx55: the state
  * store read back through the statestore source equals the batch MERGE
  * snapshot row for row, under micro-batch splits, replay, and even
  * LATE BACKFILL (changes arriving before their base rows). */
class MergeStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** The qx55 changeset re-derived (same formulas, plain Spark). */
  private def feeds(): (Seq[MergeOp], Seq[MergeOp]) = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)").as("n"))
      .collect().map(r => MergeOp(r.getLong(0), "B", r.getLong(1))).toSeq
    val changes = base.flatMap { b =>
      val id = b.doc_id
      val op = if (id % 11 == 3) Some("D") else if (id % 7 == 0) Some("U") else None
      val upd = op.map(o => MergeOp(id, o, id * 13 % 1000))
      val ins = if (id % 5 == 0) Some(MergeOp(id + 1000000L, "I", id * 13 % 1000)) else None
      upd.toSeq ++ ins.toSeq
    }
    (base, changes)
  }

  private def runAndReadState(waves: Seq[Seq[MergeOp]], name: String): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[MergeOp]
    val ckpt = tmpDir(s"ckpt_$name")
    val input = MemoryStream[MergeOp]
    val q = MergeStream.snapshots(input.toDS())
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "snap").load()
      .selectExpr("value.doc_id", "value.version", "value.n_tokens", "value.deleted")
      .where(!col("deleted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("state store equals the batch MERGE snapshot; replay is a no-op") {
    val (base, changes) = feeds()
    val expected = SparkEntry.queries("qx55_merge_upsert")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val got = runAndReadState(
      Seq(base) ++ changes.grouped(changes.size / 3 + 1).toSeq
        ++ Seq(changes.take(20) ++ base.take(20)), // replayed wave
      "merge_stream")
    assert(got == expected,
      s"merge divergence: only-state=${(got -- expected).take(5)}, only-batch=${(expected -- got).take(5)}")
  }

  test("late backfill cannot overwrite an applied change") {
    val (base, changes) = feeds()
    val expected = SparkEntry.queries("qx55_merge_upsert")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Changes FIRST, base afterwards — the adversarial arrival order.
    val got = runAndReadState(Seq(changes, base), "merge_late")
    assert(got == expected,
      s"late-backfill divergence: only-state=${(got -- expected).take(5)}, only-batch=${(expected -- got).take(5)}")
  }
}
