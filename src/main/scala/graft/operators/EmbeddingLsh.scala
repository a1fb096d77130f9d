package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-sized sign-LSH (random-hyperplane) bucketing for embedding
  * vectors — the scale path behind the ANN (qx3) and embedding-near-dup
  * (qx12) queries.
  *
  * Round-2 verdict #1: a fixed 256-bucket space makes within-bucket
  * candidate pairs grow ~n²/256 — quadratic. The fix is the classic
  * banded design (same shape the MinHash dedup qx4 uses):
  *
  *  - `bands` (default 8) independent signature tables — the RECALL knob:
  *    a pair is a candidate if it collides in ANY band; recall for a pair
  *    with per-plane sign-agreement q is 1 − (1 − q^planes)^bands.
  *  - `planes` bits per band — the PRECISION/SIZE knob, derived from the
  *    corpus size so the bucket count 2^planes tracks n: with
  *    planes = floor(log2(n / targetOccupancy)), expected bucket occupancy
  *    stays in [targetOcc, 2·targetOcc), so candidate pairs are
  *    ≈ bands · n · occ / 2 — LINEAR in n, at any scale. At n = 10⁹,
  *    planes = 24 → 16M buckets/band, ~60 vectors each.
  *
  * The per-plane hash is a deterministic Rademacher sign family (plane g,
  * dim d: +1 iff the low bit of (g·1000003 + d·97 + 7)² mod 2³¹−1 is 0 —
  * quadratic-residue parity; the round-2 linear-mod-31 form repeated
  * planes with period 31 and skewed buckets badly past one band), scored
  * with the codegen'd `long_dot` over plan-time-constant sign arrays — so
  * the DuckDB oracle reproduces every bucket bit-identically with integer
  * arithmetic (h ≤ ~1.9e8 ⇒ h² < 2⁶³, exact in both engines).
  *
  * The plane count must be known at PLAN time (the sign vectors fold into
  * constants), so sizing needs `n` up front: one count() on the embeddings
  * table — metadata-only on parquet, the LSH analogue of the statistics
  * pass every ANN index build does. The oracle derives the identical p
  * with integer SQL: least(24, greatest(6, length(bin(greatest(n//32,2)))−1)),
  * which equals 63 − numberOfLeadingZeros(max(n/32, 2)) for all n.
  */
object EmbeddingLsh {

  /** Number of independent band tables (recall knob, corpus-size-free). */
  val Bands = 8

  /** Bits per band: floor(log2(n / targetOcc)) clamped to [6, 24]. */
  val MinPlanes = 6
  val MaxPlanes = 24
  val TargetOccupancy = 32L

  /** Integer-only plane-count derivation — must stay in lockstep with the
    * SQL form in [[graft.queries.ExtOracle]] (length(bin(x)) − 1 ==
    * 63 − numberOfLeadingZeros(x) for x ≥ 1). */
  def planesFor(n: Long): Int = {
    val x = math.max(n / TargetOccupancy, 2L)
    val floorLog2 = 63 - java.lang.Long.numberOfLeadingZeros(x)
    math.min(MaxPlanes, math.max(MinPlanes, floorLog2))
  }

  /** Plane g's ±1 sign vector as a plan-time constant array literal. */
  def signsArray(g: Int, dims: Int = 64): String =
    (0 until dims).map { d =>
      val h = g.toLong * 1000003L + d.toLong * 97L + 7L
      if ((h * h) % 2147483647L % 2L == 0L) "1L" else "-1L"
    }.mkString("array(", ", ", ")")

  /** `emb` must carry `vec_id` and `iv` (ARRAY<BIGINT>, the integerized
    * embedding); returns one (vec_id, band, sig) row per (vector, band).
    * Each sig bit p is sign(iv · plane_{band·planes+p}); the per-band
    * explode happens AFTER the narrow projection so the (8×) row blowup
    * carries only (id, band, sig) — never the 64-long array. */
  def bandSigs(emb: DataFrame, planes: Int, bands: Int = Bands): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val sig = (0 until planes).map { p =>
        val g = b * planes + p
        s"(CASE WHEN long_dot(iv, ${signsArray(g)}) >= 0 THEN ${1L << p}L ELSE 0L END)"
      }.mkString(" + ")
      struct(lit(b.toLong).as("band"), expr(sig).as("sig"))
    }
    emb.select(col("vec_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct unordered candidate pairs (vec_a < vec_b) colliding in ≥1
    * band — a hash-partitioned equi-join on (band, sig), never all-pairs.
    * Output is ids only; callers fetch vectors for the survivors. */
  def candidatePairs(sigs: DataFrame): DataFrame =
    sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
}
