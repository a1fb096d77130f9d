package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.{HeavyHitter, WordObs}

/** Streaming Misra-Gries heavy hitters ([[HeavyHittersStream]]) — the
  * online qx19: fed the corpus word stream in arbitrary micro-batch
  * splits, the final O(k) summary satisfies the Misra-Gries contract
  * against exact batch counts: estimates never overshoot, absent words
  * are provably light, and every word heavier than n/(k+1) is present. */
class HeavyHittersStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val K = 64

  private def corpus(): Seq[WordObs] =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(
        expr("transform(filter(split(text, ' '), w -> length(w) > 0), " +
          "w -> aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003))")).as("wh"))
      .collect().map(r => WordObs(r.getString(0), r.getLong(1))).toSeq

  test("summary meets the Misra-Gries bound vs exact counts, any batch split") {
    val words = corpus()
    val exact = words.groupBy(w => (w.lang, w.wh)).view.mapValues(_.size.toLong).toMap
    val nPerLang = words.groupBy(_.lang).view.mapValues(_.size.toLong).toMap

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[WordObs]
    val input = MemoryStream[WordObs]
    val q = HeavyHittersStream.summaries(input.toDS(), K)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_hh")).start()
    try {
      // Deliberately ragged waves so summaries merge across batches.
      var rest = words
      for (frac <- Seq(7, 3, 2, 1); if rest.nonEmpty) {
        val (wave, tail) = rest.splitAt(rest.size / frac + 1)
        input.addData(wave); q.processAllAvailable()
        rest = tail
      }
    } finally q.stop()

    // Latest snapshot per language = rows at that language's max n_seen.
    val all = spark.table("hh_stream").collect()
      .map(r => HeavyHitter(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val latest = all.groupBy(_.lang).flatMap { case (_, rows) =>
      val top = rows.map(_.n_seen).max
      rows.filter(_.n_seen == top).toSeq
    }.toSeq

    assert(latest.nonEmpty)
    latest.groupBy(_.lang).foreach { case (lang, rows) =>
      val n = nPerLang(lang)
      assert(rows.head.n_seen == n, s"$lang processed ${rows.head.n_seen} of $n words")
      assert(rows.size <= K, s"$lang summary exceeds k: ${rows.size}")
      val slack = n / (K + 1)
      rows.foreach { hh =>
        val truth = exact((lang, hh.wh))
        assert(hh.est <= truth, s"$lang/${hh.wh}: est ${hh.est} overshoots $truth")
        assert(hh.est >= truth - slack,
          s"$lang/${hh.wh}: est ${hh.est} below MG floor ${truth - slack}")
      }
      // Completeness: every word heavier than n/(k+1) must be present.
      val present = rows.map(_.wh).toSet
      exact.foreach { case ((l, wh), c) =>
        if (l == lang && c > slack)
          assert(present(wh), s"$lang/$wh: true count $c > n/(k+1)=$slack but absent")
      }
    }
  }

  test("tiny vocabularies stay exact (no subtraction below k keys)") {
    val words = (0 until 500).map(i => WordObs("xx", (i % 10).toLong))
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[WordObs]
    val input = MemoryStream[WordObs]
    val q = HeavyHittersStream.summaries(input.toDS(), K)
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_hh2")).start()
    try {
      words.grouped(137).foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("hh_exact").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val finalRows = rows.filter(_._3 == 500L)
    assert(finalRows.length == 10)
    assert(finalRows.forall(_._2 == 50L), s"distinct<k must count exactly: ${finalRows.toSeq}")
  }
}
