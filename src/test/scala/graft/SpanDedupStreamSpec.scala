package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SpanDedupStream
import graft.streaming.SpanDedupStream.SpanObs

/** Streaming span claims ([[SpanDedupStream]]) — the online qx70: gram
  * claims stream through first-wins state under doc-ordered intake,
  * the doc-local island merge runs as a plain post-pass on the flagged
  * positions, and the rolled-up per-doc verdicts equal batch qx70
  * EXACTLY across micro-batch splits and replay (including the
  * re-delivered-keeper idempotency edge). */
class SpanDedupStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val K = 8

  /** The batch gate's gram rows, hashed to longs (the exchange-width
    * optimization the operator scaladoc prescribes), doc-ordered. */
  private def spanObs(): Seq[SpanObs] = {
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3L)) === 0L,
          concat(col("text"), lit(" all rights reserved see license terms at mirror "),
            pmod(col("doc_id"), lit(5L)).cast("string")))
          .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(filter(split(text, ' '), w -> length(w) > 0)) >= $K
           |THEN transform(sequence(0, size(filter(split(text, ' '), w -> length(w) > 0)) - $K),
           |  i -> hash(array_join(slice(filter(split(text, ' '), w -> length(w) > 0), i + 1, $K), ' '), 42L))
           |ELSE array() END""".stripMargin)))
      .collect().map(r => SpanObs(r.getInt(2).toLong, r.getLong(0), r.getInt(1).toLong))
      .toSeq.sortBy(o => (o.doc_id, o.i))
  }

  /** Island merge (the batch gate's gaps-and-islands, plain Scala). */
  private def rollup(flagged: Map[Long, Seq[Long]]): Map[Long, (Long, Long)] =
    flagged.map { case (doc, is) =>
      val sorted = is.sorted
      var spans = 0L; var removed = 0L
      var start = -1L; var end = -1L
      // new island iff the gap since the previous flagged START >= K
      // (end - K is the previous start: spans are equal length)
      for (i <- sorted) {
        if (start < 0) { start = i; end = i + K; spans += 1 }
        else if (i - (end - K) >= K) { removed += end - start; start = i; end = i + K; spans += 1 }
        else end = i + K
      }
      if (start >= 0) removed += end - start
      doc -> (spans, removed)
    }

  test("streamed claims + doc-local merge equal batch qx70 across splits and replay") {
    val obs = spanObs()
    val batch = SparkEntry.queries("qx70_span_dedup")(spark, dir)
      .select("doc_id", "n_spans", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SpanObs]
    val input = MemoryStream[SpanObs]
    val ckpt = tmpDir("ckpt_sd")
    val q = SpanDedupStream.claims(input.toDS())
      .writeStream.format("memory").queryName("span_stream")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      obs.grouped(obs.size / 4 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(obs.take(50)); q.processAllAvailable() // replay incl. keepers
    } finally q.stop()

    val rows = spark.table("span_stream").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // idempotency: one verdict per (doc, position)
    assert(rows.groupBy(r => (r._1, r._2)).forall(_._2.length == 1),
      "replay produced conflicting verdicts for one position")
    val flagged = rows.filter(_._3).groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSeq }
    val got = rollup(flagged)
    val expect = batch.filter(_._2._1 > 0L)
    assert(got == expect,
      s"only-stream=${(got.toSet -- expect.toSet).take(3)}, only-batch=${(expect.toSet -- got.toSet).take(3)}")

    // Observability (r8 ADVICE): sub-cursor arrivals — re-deliveries
    // here, but an ordering violation lands in the same counter — are
    // COUNTED in state, not silently absorbed. The replayed prefix
    // contributes exactly its strictly-below-final-cursor rows.
    val maxDoc = obs.groupBy(_.gram).map { case (g, xs) => g -> xs.map(_.doc_id).max }
    val expectSub = obs.take(50).count(o => o.doc_id < maxDoc(o.gram)).toLong
    val sub = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "claim").load()
      .selectExpr("value.subCursor AS s").collect().map(_.getLong(0)).sum
    assert(sub == expectSub, s"expected $expectSub sub-cursor rows counted, got $sub")
    assert(expectSub > 0L, "fixture must exercise the sub-cursor path")
  }
}
