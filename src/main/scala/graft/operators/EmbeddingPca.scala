package graft.operators

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA projection/whitening for the embedding column — the standard ANN
  * preprocessing (decorrelate + optionally equalize variance before
  * product quantization; IMI in particular assumes the two halves carry
  * comparable information, which raw embeddings rarely do).
  *
  * Distributed shape (the MLlib RowMatrix pattern):
  *
  *  1. ONE pass computes the count, per-dim sums and the d×d raw Gram
  *     Σ x·xᵀ via `mapPartitions` — the sanctioned imperative slot: a
  *     d² accumulator per TASK, merged on the driver (P·(d²+d) doubles
  *     total — KBs). The columnar spelling would be d(d+1)/2 ≈ 2080
  *     aggregate columns, far past the generated-code width this
  *     codebase's Janino cliff notes document; per-partition
  *     accumulation is the honest winner here.
  *  2. The d×d covariance eigendecomposes ON THE DRIVER (breeze
  *     `eigSym`; d = 64, microseconds) — same bounded driver round-trip
  *     as the Lloyd codebook.
  *  3. Projection is a broadcast k-row component table joined
  *     crossJoin-style, one dot per (vector, component), re-assembled
  *     per vector — the EmbeddingLsh plane-table shape (a literal
  *     constant matrix in the expression would re-hit the Janino
  *     cliff).
  *
  * Float caveat (why this operator is test-proven, not oracle-gated):
  * the Gram reduce sums doubles in partition order, so results carry
  * ~1e-15 run-to-run wobble, and no SQL oracle can re-derive an
  * eigendecomposition — correctness is pinned by variance/geometry
  * properties in EmbeddingPcaSpec instead of a hash match.
  */
object EmbeddingPca {

  val Dims = 64

  /** (count, sum vector, raw Gram Σx·xᵀ) in one distributed pass. `emb`
    * must carry `v: ARRAY<DOUBLE>(Dims)`. */
  def moments(emb: DataFrame): (Long, DenseVector[Double], DenseMatrix[Double]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val parts = emb.select(col("v")).as[Array[Double]].mapPartitions { it =>
      var n = 0L
      val s = new Array[Double](Dims)
      val g = new Array[Double](Dims * Dims)
      it.foreach { x =>
        n += 1
        var i = 0
        while (i < Dims) {
          s(i) += x(i)
          var j = 0
          while (j < Dims) { g(i * Dims + j) += x(i) * x(j); j += 1 }
          i += 1
        }
      }
      Iterator.single((n, s, g))
    }
    val (n, s, g) = parts.reduce { (a, b) =>
      (a._1 + b._1,
        Array.tabulate(Dims)(i => a._2(i) + b._2(i)),
        Array.tabulate(Dims * Dims)(i => a._3(i) + b._3(i)))
    }
    (n, DenseVector(s), new DenseMatrix(Dims, Dims, g))
  }

  /** Driver-side PCA model: `components` is (j, pc vector, mdot = μ·pc,
    * eigenvalue) ordered by eigenvalue DESC; `trace` is tr(cov) = Σ all
    * [[Dims]] eigenvalues = Σ per-dim sample variance — the invariant the
    * qx46 gate checks against DuckDB's per-dim `var_samp`.
    *
    * `offDiagRatio` = ‖offdiag(cov)‖_F / ‖diag(cov)‖_F — the ROTATION
    * GATE (round-6 verdict #5): PCA/OPQ-style rotation decorrelates, so
    * it can only help a product index when the covariance is genuinely
    * non-diagonal. ≈0 (iid / axis-aligned corpora, the aniso fixture) ⇒
    * rotation is a measured no-op — skip it and save the projection
    * pass; large (correlated noise, the corr fixture) ⇒ rotate before
    * building product cells/codes. [[rotationAdvised]] applies the
    * default threshold. */
  final case class PcaModel(
      components: Seq[(Int, Array[Double], Double, Double)], trace: Double,
      offDiagRatio: Double, mean: Array[Double])

  /** Default [[PcaModel.offDiagRatio]] threshold above which rotation is
    * worth composing into a product index — an order of magnitude above
    * the sampling noise a genuinely diagonal covariance shows at the
    * fixture's corpus sizes, far below the ≳1 ratios correlated noise
    * produces. */
  val RotationThreshold = 0.1

  def rotationAdvised(model: PcaModel): Boolean =
    model.offDiagRatio > RotationThreshold

  /** Fit the PCA model on the driver (one distributed [[moments]] pass +
    * a d×d eigensolve — microseconds at d = 64). Each component's sign is
    * canonicalized (coordinate of max |value| made positive) so repeated
    * fits over reshuffled data emit replay-identical projections: eigSym
    * signs are otherwise an arbitrary LAPACK artifact. */
  def fit(emb: DataFrame, k: Int, whiten: Boolean = false): PcaModel = {
    require(k >= 1 && k <= Dims, s"k must lie in [1, $Dims]")
    val (n, s, g) = moments(emb)
    require(n > 1, "PCA needs at least 2 rows")
    val mu = s / n.toDouble
    // Covariance = (Σx·xᵀ − n·μμᵀ) / (n − 1)
    val cov = (g - (mu * mu.t) * n.toDouble) / (n - 1).toDouble
    val trace = (0 until Dims).map(d => cov(d, d)).sum
    val diag2 = (0 until Dims).map(d => cov(d, d) * cov(d, d)).sum
    val off2 = (for (i <- 0 until Dims; j <- 0 until Dims if i != j)
      yield cov(i, j) * cov(i, j)).sum
    val offDiagRatio = math.sqrt(off2) / math.max(math.sqrt(diag2), Double.MinPositiveValue)
    val es = eigSym(cov) // eigenvalues ASC in breeze
    val order = (0 until Dims).sortBy(i => -es.eigenvalues(i)).take(k)
    val rows = order.zipWithIndex.map { case (ei, j) =>
      val lambda = math.max(es.eigenvalues(ei), 0.0)
      val scale = if (whiten) 1.0 / math.sqrt(lambda + 1e-12) else 1.0
      val raw = (0 until Dims).map(d => es.eigenvectors(d, ei)).toArray
      val flip = if (raw(raw.indices.maxBy(d => math.abs(raw(d)))) < 0) -1.0 else 1.0
      val pc = raw.map(_ * scale * flip)
      val mdot = (0 until Dims).map(d => mu(d) * pc(d)).sum
      (j, pc, mdot, lambda)
    }
    PcaModel(rows, trace, offDiagRatio, mu.toArray)
  }

  /** [[fit]]'s component table as a broadcastable DataFrame
    * (j, pcv ARRAY<DOUBLE>, mdot, eigval), eigenvalue DESC. */
  def componentsDF(spark: org.apache.spark.sql.SparkSession, model: PcaModel): DataFrame = {
    val rows = model.components.map { case (j, pc, mdot, lambda) =>
      org.apache.spark.sql.Row(j, pc.toSeq, mdot, lambda)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("j", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("pcv",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false), false),
        org.apache.spark.sql.types.StructField("mdot", org.apache.spark.sql.types.DoubleType, false),
        org.apache.spark.sql.types.StructField("eigval", org.apache.spark.sql.types.DoubleType, false))))
  }

  /** Top-k principal components of `emb`'s covariance: a k-row table
    * (j, pcv ARRAY<DOUBLE>, mdot, eigval), ordered by eigenvalue DESC.
    * `whiten` scales each component by 1/√λ so projected dims have unit
    * variance. mdot = μ·pc is the centering offset, precomputed so the
    * projection never materializes (x − μ) per row. */
  def principalComponents(emb: DataFrame, k: Int, whiten: Boolean = false): DataFrame =
    componentsDF(emb.sparkSession, fit(emb, k, whiten))

  /** (vec_id, p ARRAY<DOUBLE>(k)): each vector projected onto the
    * component table — broadcast k rows, one zip_with dot per
    * (vector, component), re-assembled in component order. */
  def project(emb: DataFrame, pcs: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("v")).crossJoin(broadcast(pcs.select("j", "pcv", "mdot")))
      .select(col("vec_id"), col("j"),
        (expr("aggregate(zip_with(v, pcv, (a, b) -> a * b), 0D, (s, x) -> s + x)")
          - col("mdot")).as("pj"))
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(j, pj))), e -> e.pj)").as("p"))
}
