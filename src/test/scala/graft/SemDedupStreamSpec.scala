package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IvfAnn
import graft.streaming.SemDedupStream
import graft.streaming.SemDedupStream.{Cent, VecIn}

/** Streaming semantic dedup ([[SemDedupStream]]) — the online qx50:
  * (1) with all vectors arriving live in id order, resolved drop rows
  * equal batch qx50 EXACTLY (ids, counts, and bit-identical cosines)
  * across different micro-batch splits — which pins the typed
  * quantization, cell ranking and cosine against their SQL spellings
  * end to end; (2) re-delivery emits nothing and grows no state;
  * (3) corpus backfill screens live arrivals without ever emitting;
  * (4) the occupancy cap bounds state while saturated cells keep
  * flagging. */
class SemDedupStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Seq[VecIn] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => VecIn(r.getLong(0), r.getSeq[Float](1).toArray, is_new = true))
      .sortBy(_.vec_id).toSeq

  /** The SAME offline index batch qx50 trains. */
  private lazy val codebook: Array[Cent] = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet").select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))").as("iv"))
    val k = IvfAnn.kmeansCentroidsFor(base.count())
    IvfAnn.trainedCentroids(base, IvfAnn.centroids(spark, k), iters = 2)
      .collect().map(r => Cent(r.getLong(0), r.getSeq[Long](1).toArray))
  }

  private def batchDrops(): Set[(Long, Long, Double)] =
    SparkEntry.queries("qx50_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def runStream(waves: Seq[Seq[VecIn]], name: String): Set[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[VecIn]
    val input = MemoryStream[VecIn]
    val q = SemDedupStream.candidates(input.toDS(), codebook)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    SemDedupStream.resolveDrops(spark.table(name))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("streamed drops equal batch qx50 across micro-batch splits") {
    val expected = batchDrops()
    assert(expected.nonEmpty, "no semantic dups at this sf — test is vacuous")
    val v1 = runStream(vecs.grouped(vecs.size / 3 + 1).toSeq, "sem_s1")
    assert(v1 == expected,
      s"split1 divergence: only-stream=${(v1 -- expected).take(3)}, only-batch=${(expected -- v1).take(3)}")
    val v2 = runStream(vecs.grouped(17).toSeq, "sem_s2")
    assert(v2 == expected,
      s"split2 divergence: only-stream=${(v2 -- expected).take(3)}, only-batch=${(expected -- v2).take(3)}")
  }

  test("re-delivered wave emits nothing new and corpus backfill never emits") {
    val (corpus, live) = vecs.partition(_.vec_id % 5 != 2)
    val corpusIn = corpus.map(_.copy(is_new = false))
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[VecIn]
    val input = MemoryStream[VecIn]
    val q = SemDedupStream.candidates(input.toDS(), codebook)
      .writeStream.format("memory").queryName("sem_replay")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_sem_replay")).start()
    try {
      input.addData(corpusIn); q.processAllAvailable()
      assert(spark.table("sem_replay").isEmpty, "corpus backfill must not emit")
      input.addData(live); q.processAllAvailable()
      val after = spark.table("sem_replay").collect()
      assert(after.nonEmpty, "no live candidates — replay test is vacuous")
      // Live drops may cite corpus members of ANY id, live ones only lower.
      input.addData(live); q.processAllAvailable()
      assert(spark.table("sem_replay").count() == after.length,
        "re-delivered wave emitted new candidates")
    } finally q.stop()
  }

  test("occupancy cap bounds state while saturated cells keep flagging") {
    val one = Array.fill(64)(0.5f)
    val book = Array(Cent(0L, SemDedupStream.intVec(one))) // single cell
    val feed = (1L to 6L).map(id => VecIn(id, one, is_new = true))
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[VecIn]
    val input = MemoryStream[VecIn]
    val ckpt = tmpDir("ckpt_sem_cap")
    val q = SemDedupStream.candidates(input.toDS(), book, maxOccupancy = 2)
      .writeStream.format("memory").queryName("sem_capped")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try { input.addData(feed); q.processAllAvailable() } finally q.stop()
    val drops = SemDedupStream.resolveDrops(spark.table("sem_capped"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Ids 2..6 all flag; each screens only the 2 retained exemplars
    // (id 2 sees just id 1 — it arrived before saturation).
    assert(drops == Set((2L, 1L), (3L, 2L), (4L, 2L), (5L, 2L), (6L, 2L)),
      s"capped drops diverged: $drops")
    val overflow = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "overflow").load()
      .selectExpr("value.value AS n").collect().map(_.getLong(0)).sum
    assert(overflow == 4L, s"expected 4 skipped appends, got $overflow")
  }
}
