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
  * with the codegen'd `long_dot` against a broadcast sign-vector table —
  * so the DuckDB oracle reproduces every bucket bit-identically with
  * integer arithmetic (h ≤ ~1.9e8 ⇒ h² < 2⁶³, exact in both engines).
  *
  * The plane count must be known at PLAN time (table size and bit
  * positions are plan constants), so sizing needs `n` up front: one
  * count() on the embeddings table — metadata-only on parquet, the LSH
  * analogue of the statistics pass every ANN index build does. The oracle
  * derives the identical p with integer SQL:
  * least(24, greatest(6, length(bin(greatest(n//32,2)))−1)), which equals
  * 63 − numberOfLeadingZeros(max(n/32, 2)) for all n.
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

  /** The bands·planes sign vectors as a (g, sv) table — one row per
    * plane, built by expression and always broadcastable.
    *
    * A table, NOT plan-time constant arrays: constants make the generated
    * code grow as planes·dims, and past ~50 planes Janino compilation of
    * the split-up methods dominates the query (the 10× probe caught
    * executors spending minutes in UnitCompiler at planes=9). A broadcast
    * join keeps code size O(1) in the plane count — the same shape
    * [[IvfAnn]] uses for its centroid table. */
  def planeTable(spark: org.apache.spark.sql.SparkSession, planes: Int,
                 bands: Int = Bands): DataFrame =
    spark.range(bands.toLong * planes).select(
      col("id").as("g"),
      expr("transform(sequence(0, 63), d -> CASE WHEN " +
        "((id * 1000003 + d * 97 + 7) * (id * 1000003 + d * 97 + 7)) % 2147483647 % 2 = 0 " +
        "THEN 1L ELSE -1L END)").as("sv"))

  /** `emb` must carry `vec_id` and `iv` (ARRAY<BIGINT>, the integerized
    * embedding); returns one (vec_id, band, sig) row per (vector, band).
    * Sig bit (g mod planes) of band (g div planes) is sign(iv · sv_g):
    * one broadcast crossJoin against the plane table, one map-side-
    * combinable bit fold — the only shuffle carries (vec_id, band, sig)
    * triples, never the 64-long array. */
  def bandSigs(emb: DataFrame, planes: Int, bands: Int = Bands): DataFrame = {
    val spark = emb.sparkSession
    emb.select(col("vec_id"), col("iv"))
      .crossJoin(broadcast(planeTable(spark, planes, bands)))
      .select(col("vec_id"), expr(s"g div $planes").as("band"),
        expr(s"CASE WHEN long_dot(iv, sv) >= 0 " +
          s"THEN shiftleft(1L, CAST(g % $planes AS INT)) ELSE 0L END").as("bitval"))
      .groupBy("vec_id", "band")
      .agg(sum("bitval").cast("long").as("sig"))
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
