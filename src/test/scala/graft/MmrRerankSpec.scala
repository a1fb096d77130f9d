package graft

import graft.operators.MmrRerank

/** Round-12 — the MMR greedy behind qx98, driven by hand fixtures the
  * gate's corpus-sized run cannot isolate: the diversity swap (a
  * near-duplicate of the top pick must lose to a less relevant but
  * diverse candidate), the λ extremes, and the vec_id ASC tie-break.
  */
class MmrRerankSpec extends SparkTestBase {

  import spark.implicits._

  // One query, pool of four: 1 and 2 are near-duplicates (sim .99),
  // 3 is diverse (sim .10 to everything), 4 diverse but weak.
  private def cand = Seq(
    (7L, 1, 10L, 0.95), (7L, 2, 11L, 0.94), (7L, 3, 12L, 0.80), (7L, 4, 13L, 0.60)
  ).toDF("qid", "rk", "vec_id", "cosine")

  private def pairs = {
    val sims = Seq(
      (10L, 11L, 0.99), (10L, 12L, 0.10), (10L, 13L, 0.10),
      (11L, 12L, 0.10), (11L, 13L, 0.10), (12L, 13L, 0.10))
    (sims ++ sims.map { case (a, b, s) => (b, a, s) })
      .map { case (a, b, s) => (7L, a, b, s) }
      .toDF("qid", "va", "vb", "sim")
  }

  test("the near-duplicate of the top pick is deferred to LAST") {
    val out = MmrRerank.rerank(cand, pairs, k = 4, lambda = 0.7)
      .orderBy("step").as[(Long, Int, Long, Double)].collect()
    // Hand-computed greedy: step1 10 (top-1). Step2: 12 at
    // .7·.80−.3·.10 = .53 beats 11 at .7·.94−.3·.99 = .361. Step3: even
    // the WEAK diverse 13 (.7·.60−.3·.10 = .39) still beats 11's .361 —
    // the redundancy penalty defers the 0.94-relevant near-dup to the
    // final slot. Plain top-k would have ranked it 2nd.
    assert(out.map(_._3).toSeq == Seq(10L, 12L, 13L, 11L),
      "MMR must defer the 0.99-similar near-duplicate behind both diverse picks")
    assert(math.abs(out(0)._4 - 0.7 * 0.95) < 1e-12)
    assert(math.abs(out(1)._4 - (0.7 * 0.80 - 0.3 * 0.10)) < 1e-12)
    assert(math.abs(out(2)._4 - (0.7 * 0.60 - 0.3 * 0.10)) < 1e-12)
    assert(math.abs(out(3)._4 - (0.7 * 0.94 - 0.3 * 0.99)) < 1e-12)
  }

  test("the size-gated local replay equals the unrolled plan form (mmr bits included)") {
    // Round 17: rerank() replays the greedy on the driver below the
    // measured-size gate; (qid, step, vec_id) AND the double mmr must be
    // bit-identical to the plan form across λ values.
    for (lam <- Seq(0.7, 0.3, 1.0)) {
      val local = MmrRerank.rerank(cand, pairs, k = 4, lambda = lam)
        .as[(Long, Int, Long, Double)].collect().sortBy(t => (t._1, t._2))
      val dist = MmrRerank.rerankDistributed(cand, pairs, k = 4, lambda = lam)
        .as[(Long, Int, Long, Double)].collect().sortBy(t => (t._1, t._2))
      assert(local.nonEmpty && local.toSeq === dist.toSeq, s"lambda=$lam")
    }
  }

  test("λ = 1 degenerates to plain relevance order") {
    val out = MmrRerank.rerank(cand, pairs, k = 4, lambda = 1.0)
      .orderBy("step").as[(Long, Int, Long, Double)].collect()
    assert(out.map(_._3).toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("exact mmr ties break on vec_id ASC") {
    // Two candidates with identical rel and identical penalty geometry.
    val c = Seq((1L, 1, 5L, 0.9), (1L, 2, 21L, 0.5), (1L, 3, 20L, 0.5))
      .toDF("qid", "rk", "vec_id", "cosine")
    val p = Seq((5L, 20L), (5L, 21L), (20L, 21L))
      .flatMap { case (a, b) => Seq((1L, a, b, 0.2), (1L, b, a, 0.2)) }
      .toDF("qid", "va", "vb", "sim")
    val out = MmrRerank.rerank(c, p, k = 2, lambda = 0.7)
      .orderBy("step").as[(Long, Int, Long, Double)].collect()
    assert(out(1)._3 == 20L, "tied mmr must resolve to the lower vec_id")
  }
}
