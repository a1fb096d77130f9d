package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingPca

/** [[EmbeddingPca]] — correctness by geometry, not hash (float reduce
  * order and eigendecomposition have no SQL oracle): on a corpus with
  * variance planted in two known directions, PCA must find them, order
  * them, and preserve pairwise geometry in the projection; whitening
  * must equalize variance. */
class EmbeddingPcaSpec extends SparkTestBase {

  /** Variance planted along e0 (σ≈40) and e1 (σ≈12); all other dims
    * carry ±1 noise. Deterministic integer-hash generation. */
  private def corpus(n: Long) = spark.range(n).select(
    col("id").as("vec_id"),
    expr("""transform(sequence(0, 63), d ->
      CASE WHEN d = 0 THEN CAST(pmod(xxhash64(id), 81) - 40 AS DOUBLE)
           WHEN d = 1 THEN CAST(pmod(xxhash64(id + 7), 25) - 12 AS DOUBLE)
           ELSE CAST(pmod(xxhash64(id * 64 + d), 3) - 1 AS DOUBLE) END)""").as("v"))

  test("finds the planted variance directions, ordered by eigenvalue") {
    val pcs = EmbeddingPca.principalComponents(corpus(4000), k = 2)
      .orderBy("j").collect()
    val ev = pcs.map(_.getDouble(3))
    assert(ev(0) > ev(1) && ev(1) > 3.0,
      s"eigenvalues not ordered/separated: ${ev.toSeq}")
    // Component 0 must align with e0, component 1 with e1 (up to sign).
    val pc0 = pcs(0).getSeq[Double](1)
    val pc1 = pcs(1).getSeq[Double](1)
    assert(math.abs(pc0(0)) > 0.99, s"pc0 not aligned with e0: ${pc0(0)}")
    assert(math.abs(pc1(1)) > 0.99, s"pc1 not aligned with e1: ${pc1(1)}")
  }

  test("k=2 projection preserves pairwise distances of the planted plane") {
    val emb = corpus(500)
    val pcs = EmbeddingPca.principalComponents(emb, k = 2)
    val proj = EmbeddingPca.project(emb, pcs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Planted-plane distance (dims 0,1) vs projected distance: the
    // noise dims contribute ≤ 64·4 to squared distance; the planted
    // plane dominates for far pairs — spot-check a deterministic set.
    for (a <- 0L until 20L; b <- 21L until 40L) {
      val dPlane = math.sqrt(math.pow(raw(a)(0) - raw(b)(0), 2) + math.pow(raw(a)(1) - raw(b)(1), 2))
      val dProj = math.sqrt(proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(dPlane - dProj) <= 6.0,
        s"pair ($a,$b): plane dist $dPlane vs projected $dProj")
    }
  }

  test("whitening equalizes projected variance to ~1") {
    val emb = corpus(4000)
    val pcs = EmbeddingPca.principalComponents(emb, k = 2, whiten = true)
    val variances = EmbeddingPca.project(emb, pcs)
      .select(expr("p[0]").as("p0"), expr("p[1]").as("p1"))
      .agg(variance(col("p0")), variance(col("p1"))).head()
    for (i <- 0 until 2)
      assert(math.abs(variances.getDouble(i) - 1.0) < 0.05,
        s"whitened dim $i variance ${variances.getDouble(i)} != ~1")
  }

  test("component signs are canonical: the max-|coordinate| is positive") {
    // eigSym's sign is a LAPACK artifact; fit() must flip each component
    // so replays (different partition orders) emit identical projections.
    val model = EmbeddingPca.fit(corpus(1000), k = 8)
    model.components.foreach { case (j, pc, _, _) =>
      val m = pc.indices.maxBy(d => math.abs(pc(d)))
      assert(pc(m) > 0, s"component $j max coordinate ${pc(m)} not positive")
    }
  }

  test("full-rank projection preserves norms and trace (the qx46 invariant)") {
    val emb = corpus(800)
    val model = EmbeddingPca.fit(emb, k = EmbeddingPca.Dims)
    val pcs = EmbeddingPca.componentsDF(spark, model)
    val row = EmbeddingPca.project(emb, pcs)
      .select(col("vec_id"), expr("aggregate(p, 0D, (s, x) -> s + x * x)").as("pn"))
      .join(emb.select(col("vec_id"), col("v")), "vec_id")
      .select(sum(col("pn")).as("sp"))
      .head()
    // Σ‖p‖² / (n−1) must equal tr(cov) = Σ eigenvalues.
    assert(math.abs(row.getDouble(0) / 799.0 - model.trace) < 1e-6 * model.trace,
      s"projected variance ${row.getDouble(0) / 799.0} != trace ${model.trace}")
  }

  test("offDiagRatio gate separates correlated from diagonal covariance") {
    // The planted corpus has independent dims -> ~diagonal covariance:
    // the rotation gate must NOT advise. Duplicating the big dim into
    // dim 1 makes cov(0,1) = var(0) -> the gate must advise.
    val indep = EmbeddingPca.fit(corpus(2000), k = 2)
    assert(!EmbeddingPca.rotationAdvised(indep),
      s"gate advised rotation on diagonal covariance (ratio ${indep.offDiagRatio})")
    val correlated = spark.range(2000).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
        CASE WHEN d <= 1 THEN CAST(pmod(xxhash64(id), 81) - 40 AS DOUBLE)
             ELSE CAST(pmod(xxhash64(id * 64 + d), 3) - 1 AS DOUBLE) END)""").as("v"))
    val corr = EmbeddingPca.fit(correlated, k = 2)
    assert(EmbeddingPca.rotationAdvised(corr) && corr.offDiagRatio > 0.5,
      s"gate missed correlated covariance (ratio ${corr.offDiagRatio})")
  }

  test("projects the real embeddings table without degenerate output") {
    val emb = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val pcs = EmbeddingPca.principalComponents(emb, k = 8)
    val proj = EmbeddingPca.project(emb, pcs)
    assert(proj.count() == emb.count())
    val stats = proj.select(explode(col("p")).as("x"))
      .agg(count(when(isnan(col("x")) || col("x").isNull, 1)).as("bad"),
        variance(col("x")).as("v")).head()
    assert(stats.getLong(0) == 0L, "NaN/null in projection")
    assert(stats.getDouble(1) > 0.0, "projection collapsed to a constant")
  }
}
