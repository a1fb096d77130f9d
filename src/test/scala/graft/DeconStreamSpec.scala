package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DeconStream
import graft.streaming.NearDupStream.DocText

/** Streaming decontamination ([[DeconStream]]) — the online qx32: fed
  * the corpus through MemoryStream with the batch-built Bloom image +
  * exact eval window set as broadcast values, the flagged (doc_id,
  * n_shared) set equals batch qx32 exactly — pinning the typed window
  * fold and Bloom bit test against their SQL spellings end to end. */
class DeconStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val MWords = 1024
  private val D = 3

  // The qx32 eval-side derivation, re-spelled (its internals are private
  // to ExtQueries): qx21's stratified sample is the benchmark, its
  // distinct 8-word window hashes the fingerprints.
  private def evalArtifacts(): (Set[Long], Array[Long], Set[Long]) = {
    val evalIds = SparkEntry.queries("qx21_stratified_sample")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wins = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(evalIds.toSeq: _*))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
      .select(col("doc_id"), col("pos"),
        expr("aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("wh"))
    val byPos = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until 8).foldLeft(wins.withColumnRenamed("wh", "h0")) {
      (df, i) => df.withColumn(s"h$i", lead("h0", i).over(byPos))
    }
    val fold = (1 until 8).foldLeft("h0")((acc, i) => s"(($acc) * 1009 + h$i) % 2147483647")
    val evalWins = leads.where(col("h7").isNotNull)
      .select(expr(fold).as("s")).distinct()
    val image = evalWins.agg(expr(s"bloom_agg(s, $MWords, $D)").as("bf"))
      .head().getSeq[Long](0).toArray
    (evalIds, image, evalWins.collect().map(_.getLong(0)).toSet)
  }

  test("streamed decon flags equal batch qx32 exactly") {
    val (evalIds, image, evalWins) = evalArtifacts()
    assert(evalWins.nonEmpty)
    val expected = SparkEntry.queries("qx32_bloom_decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "no contamination at this sf — test is vacuous")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => DocText(r.getLong(0), r.getString(1))).toSeq.sortBy(_.doc_id)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = DeconStream.screen(input.toDS(), image, D, evalWins, evalIds)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_decon")).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("decon_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"decon divergence: only-stream=${got -- expected}, only-batch=${expected -- got}")
  }
}
