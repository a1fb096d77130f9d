package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DsirSelect
import graft.streaming.DriftStream
import graft.streaming.DriftStream.SrcShardFeats

/** Streaming drift model ([[DriftStream]]) — the online qx93: the
  * standing per-source histograms equal the batch aggregation cell for
  * cell across splits and replay, and the full drift table computed
  * from state reproduces the gate's rows exactly. */
class DriftStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val B = DsirSelect.B

  test("state histograms equal batch counts; the drift table replays the gate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)

    val batchCounts = DsirSelect.featureRows(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text")), "src0")
      .groupBy("source", "b").agg(count(lit(1)).as("cs"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }

    val rows = docs.flatMap { case (id, src, text) =>
      DriftStream.shardRows(src, id, text)
    }.toSeq

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SrcShardFeats]
    val input = MemoryStream[SrcShardFeats]
    val ckpt = tmpDir("ckpt_drift")
    val q = DriftStream.histograms(input.toDS())
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      rows.grouped(rows.size / 5 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(rows.take(60)); q.processAllAvailable() // replay
    } finally q.stop()

    val model = DriftStream.modelFromCheckpoint(spark, ckpt)
    assert(model == batchCounts,
      s"state histograms diverged from batch counts for sources " +
        s"${model.keySet.union(batchCounts.keySet).filter(s =>
          model.getOrElse(s, Map.empty) != batchCounts.getOrElse(s, Map.empty)).take(3)}")

    // End to end: qx93's drift table from STATE — per-source micro
    // histograms, L1 vs the summed corpus mixture, argmax gap with the
    // smallest-bucket tie-break — must equal the gate.
    val corp = model.values.flatten
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val nc = corp.values.sum
    val fromState = model.map { case (src, hist) =>
      val ns = hist.values.sum
      val rowsG = corp.keys.toSeq.sorted.map { b =>
        val ps = Math.floorDiv(1000000L * hist.getOrElse(b, 0L), ns)
        val pc = Math.floorDiv(1000000L * corp(b), nc)
        (b, ps - pc)
      }
      val l1 = rowsG.map { case (_, g) => math.abs(g) }.sum
      val top = rowsG.maxBy { case (b, g) => (math.abs(g), -b) }
      src -> (ns, l1, top._1, top._2)
    }
    val gate = SparkEntry.queries("qx93_source_drift")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(fromState == gate,
      s"drift table from state diverged from the gate: " +
        s"diff=${(fromState.toSet -- gate.toSet).take(3)}")
  }
}
