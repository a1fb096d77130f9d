package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OPQ-flavored subspace layout (Ge, He, Ke & Sun, "Optimized Product
  * Quantization", CVPR 2013 — the non-parametric dimension-assignment
  * half): product quantization's accuracy hinges on how the 64 dims are
  * split into the M = 8 subspaces — natural contiguous slices put
  * whatever energy the embedding space concentrates in its leading
  * coordinates into ONE codebook of 16 centroids while the rest idle.
  * The published remedy short of a learned rotation is to BALANCE the
  * subspaces: rank dims by corpus energy and deal them to subspaces so
  * every codebook quantizes a comparable slice of the total.
  *
  * This implements the deterministic snake (boustrophedon) deal: dims
  * ranked by energy descending, rank r lands in group `r % M` on even
  * blocks of M and mirrored `M−1 − r % M` on odd blocks — block b gets
  * the b·M-th..(bM+M−1)-th hottest dims spread one per group,
  * alternating direction so no group systematically collects the hotter
  * end of each block. Unlike OPQ's iterated eigenvalue-allocation this
  * is closed-form — ONE corpus scan for the energies, then pure rank
  * arithmetic — which is exactly what makes it oracle-replayable
  * (qx99) and a stable, versionable index asset at 100 TB (the layout
  * is 64 integers; re-deriving it is a map-side-combinable aggregate).
  *
  * Energy is the uncentered second moment Σ iv3²_d over the corpus in
  * EXACT integer arithmetic (iv3 = floor(x·10³ + ½): |x| ≤ 1 ⇒ per-row
  * contribution ≤ 10⁶, so the Long sum holds to ~9·10¹² rows) — for
  * zero-centered embedding spaces energy IS variance, and it is the
  * quantity subspace distortion actually tracks. Ordering ties break on
  * dim index, so both engines produce the identical permutation.
  *
  * [[permute]] applies a collected layout to the integer vectors so the
  * unchanged PQ machinery ([[ProductQuantizer.booksN]],
  * [[QuantKernels.encode]]) trains/encodes over the balanced subspaces;
  * OpqLayoutSpec pins the snake against a hand fixture, the balance
  * improvement, and the PQ reconstruction-error win on an anisotropic
  * corpus.
  */
object OpqLayout {

  val M: Int = ProductQuantizer.M
  val Dim = 64

  /** Per-dim corpus energies (d, energy): explode + 64-key aggregate —
    * map-side combine reduces each task to 64 rows before the exchange,
    * so this is one scan at any corpus size. */
  def dimEnergies(embeddings: DataFrame): DataFrame =
    embeddings.select(posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"))
      .as(Seq("d", "v")))
      .groupBy("d").agg(sum(expr("v * v")).as("energy"))

  /** The snake assignment over ranked energies: adds rk (0-based energy
    * rank, ties d ASC), grp (subspace 0..M−1) and pos (0-based slot
    * within the subspace, rank order). 64-row input — the unpartitioned
    * rank windows are metadata-sized by construction. */
  def snakeLayout(energies: DataFrame): DataFrame = {
    val ranked = energies.withColumn("rk",
      row_number().over(Window.orderBy(col("energy").desc, col("d").asc)) - 1)
    ranked
      .withColumn("grp", expr(
        s"CAST(CASE WHEN (rk div $M) % 2 = 0 THEN rk % $M ELSE ${M - 1} - rk % $M END AS INT)"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("grp").orderBy("rk")) - 1)
  }

  /** Collected permutation: perm(grp·Dsub + pos) = original dim — the
    * 64-integer layout asset (bounded collect, the codebook
    * discipline). */
  def collectPerm(layout: DataFrame): Array[Int] = {
    val perm = new Array[Int](Dim)
    layout.select("d", "grp", "pos").collect().foreach { r =>
      perm(r.getInt(1) * (Dim / M) + r.getInt(2)) = r.getInt(0)
    }
    perm
  }

  /** Rewrites `iv` so subspace s occupies positions s·Dsub..s·Dsub+7 of
    * the permuted vector — downstream PQ code runs unchanged on the
    * balanced layout. Pure projection, no exchange. */
  def permute(base: DataFrame, perm: Array[Int]): DataFrame =
    permuteCol(base, "iv", perm)

  /** [[permute]] for any array column (the float `embedding` at build
    * time, the integer `iv` at admission — floor(x·10⁶+½) is per-dim,
    * so permuting before or after quantization lands identically). */
  def permuteCol(df: DataFrame, colName: String, perm: Array[Int]): DataFrame =
    df.withColumn(colName,
      expr(s"array(${perm.map(i => s"$colName[$i]").mkString(", ")})"))
}
