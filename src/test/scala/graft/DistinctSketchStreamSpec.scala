package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.DistinctSketchStream
import graft.streaming.DistinctSketchStream.ShingleObs

/** Streaming KMV sketch ([[DistinctSketchStream]]) — the online qx18:
  * min-k is a SET statistic, so the final sketch must equal the batch
  * derivation EXACTLY under any micro-batch split, and re-delivered
  * waves must be byte-level no-ops (no cursor, no ordering needed). */
class DistinctSketchStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val K = 128

  /** The corpus's (source, s, h) shingle observations — the qx18 feed,
    * deliberately NOT pre-deduplicated (set semantics absorb it). */
  private def observations(): Seq[ShingleObs] = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
      .select(col("doc_id"), col("pos"),
        expr("aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("wh"))
      .withColumn("h2", lead("wh", 1).over(byPos))
      .withColumn("h3", lead("wh", 2).over(byPos))
      .where(col("h3").isNotNull)
      .select(col("doc_id"),
        expr("((wh * 1009 + h2) % 2147483647 * 1009 + h3) % 2147483647").as("s"))
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .select(col("source"), col("s"),
        expr("(s * 1000003 + 997) % 2147483647").as("h"))
      .collect().map(r => ShingleObs(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** Batch truth: per source, the K smallest distinct (h, s) pairs. */
  private def batchSketch(obs: Seq[ShingleObs]): Map[String, Seq[(Long, Long)]] =
    obs.groupBy(_.source).view.mapValues(
      _.map(o => (o.h, o.s)).distinct.sorted.take(K)).toMap

  test("final sketch equals the batch min-k exactly; replays are no-ops") {
    val obs = observations()
    val truth = batchSketch(obs)

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[ShingleObs]
    val input = MemoryStream[ShingleObs]
    val q = DistinctSketchStream.sketches(input.toDS(), K)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_kmv")).start()
    val waves = obs.grouped(obs.size / 5 + 1).toSeq
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      def latest(): Map[String, (Long, Long, Double)] =
        spark.table("kmv_stream").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
          .groupBy(_._1).view.mapValues { rows =>
            val m = rows.maxBy(_._5); (m._2, m._3, m._4)
          }.toMap
      val before = latest()
      // At-least-once replay: re-deliver the first two waves verbatim.
      waves.take(2).foreach { w => input.addData(w); q.processAllAvailable() }
      val lastBySource = latest()
      // The replayed batches must not move the sketch at all.
      lastBySource.foreach { case (src, (n, kth, est)) =>
        val (bn, bkth, best) = before(src)
        assert((n, kth, round9(est)) == (bn, bkth, round9(best)),
          s"$src: replay moved the sketch")
      }
      // Exact batch equality of the final sketch statistics.
      truth.foreach { case (src, members) =>
        val (n, kth, est) = lastBySource(src)
        assert(n == members.size, s"$src: size $n != ${members.size}")
        val expKth = if (members.isEmpty) 0L else members.last._1
        assert(kth == expKth, s"$src: kth $kth != $expKth")
        val expEst =
          if (members.size < K) members.size.toDouble
          else if (expKth == 0L) members.size.toDouble
          else (K - 1).toDouble * 2147483647.0 / expKth
        assert(round9(est) == round9(expEst), s"$src: est $est != $expEst")
      }
    } finally q.stop()
  }
}
