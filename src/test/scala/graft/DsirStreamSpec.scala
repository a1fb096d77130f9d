package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DsirSelect
import graft.streaming.DsirStream
import graft.streaming.DsirStream.DocShardFeats

/** Streaming DSIR relevance model ([[DsirStream]]) — the online qx91:
  * the standing sharded bucket counts equal the batch aggregation cell
  * for cell across splits and replay, and the full selection replayed
  * from the state model reproduces the gate's top-64 exactly. */
class DsirStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val B = DsirSelect.B
  private val P = 2147483647L

  test("state counts equal the batch aggregation; selection replays the gate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)

    val batchCounts = DsirSelect.featureRows(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text")), "src0")
      .groupBy("b").agg(count(lit(1)).as("cr"), sum("tgt").as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val rows = docs.flatMap { case (id, src, text) =>
      DsirStream.shardRows(id, if (src == "src0") 1L else 0L, text)
    }.toSeq

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocShardFeats]
    val input = MemoryStream[DocShardFeats]
    val ckpt = tmpDir("ckpt_dsir")
    val q = DsirStream.counts(input.toDS())
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      rows.grouped(rows.size / 5 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(rows.take(80)); q.processAllAvailable() // replay
    } finally q.stop()

    val model = DsirStream.modelFromCheckpoint(spark, ckpt)
    val nonzero = model.filter { case (_, (cr, _)) => cr > 0L }
    assert(nonzero == batchCounts,
      s"state model diverged from batch counts: only-stream=" +
        s"${(nonzero.toSet -- batchCounts.toSet).take(3)} only-batch=" +
        s"${(batchCounts.toSet -- nonzero.toSet).take(3)}")

    // End to end: derive weights from STATE, score + resample in plain
    // Scala with qx91's exact arithmetic, and pin the gate's top-64.
    val nr = model.values.map(_._1).sum
    val nt = model.values.map(_._2).sum
    def w(b: Long): Long = {
      val (cr, ct) = model.getOrElse(b, (0L, 0L))
      java.lang.Math.floorDiv(10000L * (nr + B), cr + 1L) -
        java.lang.Math.floorDiv(10000L * (nt + B), ct + 1L)
    }
    val scores = docs.map { case (id, _, text) =>
      id -> DsirSelect.bucketsOf(text).map(w).sum
    }.toMap
    val m = scores.values.min
    val pri = scores.map { case (id, s) =>
      val a = (id * 1000003L + 12345L) % P
      id -> (s - m + 1L).toDouble * 2147483647.0 / ((a * a % P).toDouble + 0.5)
    }
    val top = pri.toSeq.sortBy { case (id, p) => (-p, id) }.take(64).map(_._1)
    val gate = SparkEntry.queries("qx91_dsir_select")(spark, dir)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(top == gate,
      s"selection replayed from the state model diverged from the gate")
  }
}
