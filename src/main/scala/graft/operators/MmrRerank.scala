package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance reranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity epilogue RAG retrieval and training-example
  * selection run after top-k: from each query's bounded candidate pool,
  * greedily pick k results maximizing
  * `mmr = λ·rel − (1−λ)·max_{s∈selected} sim(cand, s)` — relevance
  * traded against redundancy with what is already picked, so two
  * near-duplicate high scorers never both survive.
  *
  * The greedy recurrence is inherently sequential in k but k is a small
  * constant, so the loop UNROLLS INTO THE PLAN: step t is an anti-join
  * (pool ∖ picked) + a per-query bounded max — never a driver-side loop
  * over data, never state. All inputs are per-query bounded (pool of m,
  * m² pairwise sims), so the whole rerank costs O(queries · m² · k)
  * rows at any corpus scale and the expensive part stays the retrieval
  * that produced the pool. Determinism for the qx98 oracle: the λ
  * arithmetic is `(λ·rel) − ((1−λ)·pen)` in fixed parenthesization and
  * every argmax packs the shared (mmr DESC, id ASC) order into one
  * struct max.
  */
object MmrRerank {

  /** @param cand  (qid, rk, vec_id, cosine) — each query's pool, rk 1
    *              being the most relevant (the [[graft.queries]] topK
    *              shape).
    * @param pairs (qid, va, vb, sim) — pairwise sims inside each pool,
    *              both orientations present.
    * @return (qid, step, vec_id, mmr), step 1..k in pick order; step 1
    *         is the plain top-1 (empty selected set ⇒ penalty 0). */
  def rerank(cand0: DataFrame, pairs0: DataFrame, k: Int, lambda: Double): DataFrame = {
    // Cut lineage on both inputs (the PageRank/CC discipline): the
    // greedy references the pool k−1 times and the pairwise sims at
    // every step — without the checkpoint Spark re-derives whatever
    // produced them (for qx98 the full brute retrieval scan) once per
    // reference, turning an O(q·m²) epilogue into k× the retrieval
    // cost. Both are per-query bounded (m and m² rows), so the
    // materialization is small at any corpus size and stays on
    // executors — no driver collect.
    val cand = cand0.localCheckpoint()
    val pairs = pairs0.localCheckpoint()
    val lam = lit(lambda)
    val om = lit(1.0 - lambda)
    val rel = cand.select(col("qid"), col("vec_id"), col("cosine").as("rel"))
    val first = cand.where(col("rk") === 1)
      .select(col("qid"), lit(1).as("step"), col("vec_id"),
        (lam * col("cosine")).as("mmr"))
    (2 to k).foldLeft(first) { (sel, t) =>
      val picked = sel.select(col("qid"), col("vec_id"))
      val pen = rel.join(picked, Seq("qid", "vec_id"), "left_anti")
        .join(pairs.withColumnRenamed("va", "vec_id"), Seq("qid", "vec_id"))
        .join(picked.withColumnRenamed("vec_id", "vb"), Seq("qid", "vb"))
        .groupBy("qid", "vec_id", "rel").agg(max("sim").as("pen"))
      val pick = pen
        .withColumn("mmr", lam * col("rel") - om * col("pen"))
        .groupBy("qid")
        .agg(max(struct(col("mmr"), (-col("vec_id")).as("nid"))).as("b"))
        .select(col("qid"), lit(t).as("step"),
          (-col("b.nid")).as("vec_id"), col("b.mmr").as("mmr"))
      sel.unionByName(pick)
    }
  }
}
