package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facility-location coreset selection (Nemhauser, Wolsey & Fisher 1978
  * greedy on the facility-location objective; the selector behind
  * data-pruning pipelines à la Craig/CRUST and "coverage" coreset work):
  * within each cell, pick R representatives maximizing
  * F(S) = Σ_j max_{s∈S} sim(j, s) — every candidate as covered as
  * possible by its nearest pick. The greedy is (1−1/e)-optimal by
  * submodularity, and like [[MmrRerank]] it UNROLLS INTO THE PLAN:
  * step t = anti-join (candidates ∖ picked) → marginal gain
  * Σ_j max(sim − cov_j, 0) per candidate → one bounded argmax per
  * cell → coverage update. Never a driver loop over data.
  *
  * Everything is integer: `simw` is the caller's similarity in micro
  * units (self-sim 10⁹), so the cross-row gain sums are EXACT Longs in
  * any engine and any summation order — the repo's no-float-accumulation
  * policy (a double Σ here would be partition-order-dependent and could
  * never hash-match the oracle). Ties break (gain DESC, vec_id ASC)
  * packed into the struct max.
  *
  * Scale: inputs are per-cell bounded (the caller caps candidates per
  * cell), so each step is O(cells · C²) narrow rows; coverage is one row
  * per candidate. Lineage is cut on entry and per round (the
  * PageRank/MmrRerank discipline) so whatever corpus-sized scan produced
  * the candidates runs exactly once.
  */
object CoresetSelect {

  /** @param cand0  (cid, vec_id) — each cell's capped candidate set.
    * @param pairs0 (cid, i, j, simw) — ALL ordered candidate pairs per
    *               cell INCLUDING i = j (self-coverage, simw = 10⁹);
    *               simw is similarity in exact integer micro-units.
    * @param r      representatives per cell (cells with fewer
    *               candidates simply stop early).
    * @return (cid, step, vec_id, gain) in pick order — gain is the
    *         marginal facility-location objective the pick added. */
  def greedy(cand0: DataFrame, pairs0: DataFrame, r: Int): DataFrame = {
    val cand = cand0.localCheckpoint()
    val pairs = pairs0.localCheckpoint()
    var cov = cand.select(col("cid"), col("vec_id").as("j"), lit(0L).as("cov"))
    var sel: DataFrame = null
    for (t <- 1 to r) {
      val avail =
        if (sel == null) cand
        else cand.join(sel.select(col("cid"), col("vec_id")),
          Seq("cid", "vec_id"), "left_anti")
      val gains = avail
        .join(pairs.withColumnRenamed("i", "vec_id"), Seq("cid", "vec_id"))
        .join(cov, Seq("cid", "j"))
        .groupBy("cid", "vec_id")
        .agg(sum(greatest(col("simw") - col("cov"), lit(0L))).as("gain"))
      val pick = gains.groupBy("cid")
        .agg(max(struct(col("gain"), (-col("vec_id")).as("nid"))).as("b"))
        .select(col("cid"), lit(t).as("step"),
          (-col("b.nid")).as("vec_id"), col("b.gain").as("gain"))
      sel = if (sel == null) pick else sel.unionByName(pick)
      cov = cov
        .join(pick.select(col("cid"), col("vec_id").as("pi")), Seq("cid"))
        .join(pairs.select(col("cid"), col("i").as("pi"), col("j"),
          col("simw").as("ps")), Seq("cid", "pi", "j"))
        .select(col("cid"), col("j"), greatest(col("cov"), col("ps")).as("cov"))
        .localCheckpoint()
    }
    sel
  }
}
