package graft

import graft.operators.CoresetSelect

/** Round-12 — the facility-location greedy behind qx100, pinned three
  * ways the corpus-sized gate cannot isolate: the diversity pick on a
  * hand fixture (the near-twin of the first pick defers behind a
  * diverse candidate), exact equality with an independent driver-side
  * greedy over a pseudo-random multi-cell fixture, and the
  * submodularity invariant (per-cell marginal gains never increase).
  */
class CoresetSelectSpec extends SparkTestBase {

  import spark.implicits._

  private val SELF = 1000000000L

  private def pairsDf(sims: Seq[(Long, Long, Long, Long)]) = {
    // (cid, i, j, simw) with both orientations and the self rows added.
    val both = sims.flatMap { case (c, a, b, s) => Seq((c, a, b, s), (c, b, a, s)) }
    val ids = sims.flatMap { case (c, a, b, _) => Seq((c, a), (c, b)) }.distinct
    (both ++ ids.map { case (c, v) => (c, v, v, SELF) })
      .toDF("cid", "i", "j", "simw")
  }

  test("the near-twin of the first pick defers behind the diverse candidate") {
    val cand = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("cid", "vec_id")
    val pairs = pairsDf(Seq(
      (1L, 1L, 2L, 980000000L), (1L, 1L, 3L, 500000000L), (1L, 2L, 3L, 500000000L)))
    val out = CoresetSelect.greedy(cand, pairs, r = 3)
      .orderBy("step").as[(Long, Int, Long, Long)].collect()
    // Hand greedy: 1 and 2 tie at 1e9+.98e9+.5e9 (id tie → 1); then 3's
    // marginal .5e9 beats 2's residual .02e9; 2 comes last.
    assert(out.map(_._3).toSeq == Seq(1L, 3L, 2L))
    assert(out.map(_._4).toSeq == Seq(2480000000L, 500000000L, 20000000L))
  }

  /** Independent greedy the Spark plan must match exactly. */
  private def refGreedy(cands: Seq[Long], sim: (Long, Long) => Long,
                        r: Int): Seq[(Int, Long, Long)] = {
    val cov = collection.mutable.Map(cands.map(_ -> 0L): _*)
    val picked = collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    for (t <- 1 to math.min(r, cands.size)) {
      val avail = cands.filterNot(v => picked.exists(_._2 == v))
      val best = avail.map { i =>
        (cands.map(j => math.max(sim(i, j) - cov(j), 0L)).sum, i)
      }.maxBy { case (g, i) => (g, -i) }
      picked += ((t, best._2, best._1))
      cands.foreach(j => cov(j) = math.max(cov(j), sim(best._2, j)))
    }
    picked.toSeq
  }

  test("matches an independent driver-side greedy over a random fixture") {
    def sim(a: Long, b: Long): Long =
      if (a == b) SELF
      else { // symmetric deterministic pseudo-random micro-sim
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        ((lo * 1000003L + hi * 917L + 13L) * 2654435761L % 2147483647L) % SELF
      }
    val cells = (0L until 5L).map(c => c -> (0L until 6L).map(v => c * 100 + v))
    val cand = cells.flatMap { case (c, vs) => vs.map(c -> _) }.toDF("cid", "vec_id")
    val pairs = cells.flatMap { case (c, vs) =>
      for (i <- vs; j <- vs) yield (c, i, j, sim(i, j))
    }.toDF("cid", "i", "j", "simw")
    val got = CoresetSelect.greedy(cand, pairs, r = 4)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq).toMap
    cells.foreach { case (c, vs) =>
      val want = refGreedy(vs, sim, 4)
      assert(got(c) == want, s"cell $c diverged: got ${got(c)}, want $want")
      // Submodularity: marginal gains never increase along the greedy.
      val gains = want.map(_._3)
      assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
        s"cell $c gains $gains not non-increasing")
    }
    // Round 17: the size-gated local solve must match the unrolled plan
    // form row for row (schema included) on the same fixture.
    val dist = CoresetSelect.greedyDistributed(cand, pairs, r = 4)
    val local = CoresetSelect.greedy(cand, pairs, r = 4)
    assert(local.schema.map(f => (f.name, f.dataType)) ===
      dist.schema.map(f => (f.name, f.dataType)))
    assert(local.as[(Long, Int, Long, Long)].collect().sorted.toSeq ===
      dist.as[(Long, Int, Long, Long)].collect().sorted.toSeq)
  }

  test("inputs violating the all-pairs contract degrade identically on both paths") {
    // ADVICE r17: candidate 9 has NO pair rows at all — the distributed
    // pairs⋈cov inner join never scores it, so it must never be picked;
    // and candidate 1's pair rows cover only {1, 2}, so after picking 1
    // the surviving cov keys shrink to {1, 2} on the distributed path
    // (cov ⋈ pick ⋈ pairs is INNER). The local replay must mirror both.
    val cand = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 9L)).toDF("cid", "vec_id")
    val pairs = Seq(
      (1L, 1L, 1L, SELF), (1L, 1L, 2L, 700000000L), (1L, 2L, 1L, 700000000L),
      (1L, 2L, 2L, SELF), (1L, 3L, 3L, SELF), (1L, 3L, 1L, 100000000L)
    ).toDF("cid", "i", "j", "simw")
    val dist = CoresetSelect.greedyDistributed(cand, pairs, r = 4)
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    val local = CoresetSelect.greedy(cand, pairs, r = 4)
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    assert(local === dist)
    assert(!local.exists(_._3 == 9L), "the pairless candidate must never be picked")
  }
}
