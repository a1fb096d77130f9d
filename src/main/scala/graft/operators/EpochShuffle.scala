package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Reproducible EPOCH SHUFFLE keys: a 4-round Feistel network over the
  * 32-bit id space, parameterized by epoch — the deterministic,
  * collision-free permutation a training data loader needs to shuffle
  * a 100 TB corpus per epoch WITHOUT RNG state, a materialized random
  * column, or any coordination: `sort by feistel(id, epoch)` is a
  * full reshuffle that any worker can recompute for any id, every
  * epoch a fresh order (this is the standard format-preserving-
  * encryption trick for dataset permutation; Black & Rogaway 2002
  * analyze the construction).
  *
  * Bijectivity is structural: each round maps (L, R) → (R, (L + F(R))
  * mod 2¹⁶) which is invertible for ANY round function F, so distinct
  * ids get distinct keys — no birthday collisions, unlike ranking by
  * a raw hash, where colliding keys make the order tie-broken by the
  * engine and the "shuffle" silently non-reproducible.
  *
  * F is the repo's cross-engine-exact squared-affine mix, with the
  * epoch folded into the round key; all arithmetic stays < 2⁶³, so
  * the DuckDB twin replays every round in BIGINT.
  *
  * Scale shape: a scan-local codegen'd expression (≈20 integer ops);
  * materializing the order is one range exchange on the key — the
  * same single-exchange class as [[ZOrderLayout]]. */
object EpochShuffle {

  /** The 16-bit round function: squared-affine of (r, round key ⊕ epoch). */
  private def f(r: String, k: Int, epoch: Int): String = {
    val kk = k + epoch * 97
    s"((((($r) * 1000003 + $kk) % 2147483647) * " +
      s"((($r) * 1000003 + $kk) % 2147483647)) % 2147483647) % 65536"
  }

  /** The round-key schedule (shared with the oracle builder). */
  val RoundKeys: Seq[Int] = Seq(13, 29, 53, 71)

  /** The full unrolled key expression, engine-parameterized only by the
    * integer-division spelling (`div` in Spark SQL, `//` in DuckDB) —
    * the oracle twin is GENERATED from this same builder, so the round
    * structure cannot drift between engines. */
  def keyExpr(idCol: String, epoch: Int, divOp: String): String = {
    var l = s"((($idCol) $divOp 65536) % 65536)"
    var r = s"(($idCol) % 65536)"
    RoundKeys.foreach { k =>
      val nr = s"(($l + (${f(r, k, epoch)})) % 65536)"
      l = r
      r = nr
    }
    s"$l * 65536 + $r"
  }

  /** A collision-free shuffle key for `idCol` (ids < 2³²) at `epoch`. */
  def shuffleKey(idCol: String, epoch: Int): Column =
    expr(keyExpr(idCol, epoch, "div"))
}
