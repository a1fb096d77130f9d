package graft

import org.apache.spark.sql.functions._

/** qx106 — DPR-style contrastive triplet mining. Pins the semantics the
  * cross-engine hash cannot state: the positive IS the dense top-1, no
  * mined negative appears anywhere in the dense top-20, the negatives
  * are exactly the best-lexically-ranked such documents in order, and
  * the overlap diagnostic recounts. */
class TripletMinerSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("triplets: positive = dense top-1; negatives = best lexical ranks outside dense top-20") {
    val dense = queries.ExtQueries.denseTop20(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lex = queries.ExtQueries.bm25Top20(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = queries.ExtQueries.qx106(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val denseByQ = dense.groupBy(_._1)
    val lexByQ = lex.groupBy(_._1)
    assert(out.map(_._1).toSet === denseByQ.keySet, "one triplet row per query")
    out.foreach { case (qid, pos, n1, n2, ov) =>
      val dq = denseByQ(qid)
      val dqIds = dq.map(_._2).toSet
      assert(pos === dq.find(_._3 == 1L).get._2, s"qid $qid: positive must be dense rank 1")
      val hard = lexByQ.getOrElse(qid, Array.empty[(Long, Long, Long)])
        .filterNot(t => dqIds(t._2)).sortBy(_._3).map(_._2)
      assert(n1 === hard.headOption.getOrElse(-1L), s"qid $qid: neg1")
      assert(n2 === (if (hard.length > 1) hard(1) else -1L), s"qid $qid: neg2")
      assert(!dqIds(n1) && !dqIds(n2), s"qid $qid: negatives must sit outside the dense top-20")
      val overlap = lexByQ.getOrElse(qid, Array.empty[(Long, Long, Long)])
        .count(t => dqIds(t._2)).toLong
      assert(ov === overlap, s"qid $qid: overlap diagnostic")
    }
    // the miner must find real hard negatives on this corpus
    assert(out.count(_._3 >= 0L) === out.length,
      "every query should have at least one lexical hard negative here")
  }

  test("sentinel: a query whose lexical hits all sit in the dense set gets -1 negatives") {
    import spark.implicits._
    // synthetic legs through the REAL factored miner: qid 7's only
    // lexical hits are dense members -> both negatives coalesce to -1
    val dense = Seq((7L, 100L, 1L), (7L, 101L, 2L)).toDF("qid", "doc_id", "dense_rk")
    val lex = Seq((7L, 100L, 1L), (7L, 101L, 2L)).toDF("qid", "doc_id", "lex_rk")
    val row = queries.ExtQueries.mineTriplets(dense, lex).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((7L, 100L, -1L, -1L, 2L)))
  }

  test("persisted-index mining == the qx106b gate row (r12 verdict #2)") {
    // HybridIndex.mineTriplets over an index built from the gate corpus
    // must equal qx106b's monolithic composition exactly — same assets
    // (the HybridIndexSpec build==monolithic argument), same shared
    // lexical leg, same shared miner; sentinel semantics ride along.
    val out = java.nio.file.Files.createTempDirectory("graft_mine_idx").toString
    operators.HybridIndex.build(spark, dir, out)
    val served = operators.HybridIndex.mineTriplets(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val gate = SparkEntry.queries("qx106b_dpr_indexed")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(served.nonEmpty)
    assert(served.toSeq === gate.toSeq,
      "index-served triplets diverged from the monolithic qx106b gate")
  }
}
