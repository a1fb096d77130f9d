package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{OpqLayout, ProductQuantizer, QuantKernels}

/** Round-12 — the OPQ-flavored subspace layout behind qx99: the snake
  * deal itself against a hand fixture (including the d-ASC tie-break),
  * the balance property it exists for, and the downstream PQ
  * reconstruction-error win on an anisotropic corpus where the natural
  * contiguous layout concentrates all the energy into one codebook.
  */
class OpqLayoutSpec extends SparkTestBase {

  private def energiesOf(base: DataFrame): DataFrame =
    base.select(posexplode(col("iv")).as(Seq("d", "v")))
      .groupBy("d").agg(sum(expr("v * v")).as("energy"))

  test("snake deal: rank arithmetic, mirrored odd blocks, d-ASC ties") {
    import spark.implicits._
    // 16 dims, energy 160 − 10·d except dims 6 and 7 tie at 100: rank
    // order is d itself, with the tie resolved 6-before-7 by d ASC.
    val en = (0 until 16).map { d =>
      val e = if (d == 6 || d == 7) 100L else 160L - 10L * d
      (d, e)
    }.toDF("d", "energy")
    val lay = OpqLayout.snakeLayout(en)
      .select("d", "rk", "grp", "pos").as[(Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    // Block 0 (ranks 0..7) deals ascending, block 1 (8..15) mirrored.
    assert(lay.map(_._2).toSeq == (0 until 16)) // rank == d, ties d ASC
    assert(lay.map(_._3).toSeq ==
      Seq(0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 0))
    // Each group holds its block-0 dim at pos 0, block-1 dim at pos 1.
    assert(lay.filter(_._3 == 0).map(t => (t._1, t._4)).toSeq == Seq((0, 0), (15, 1)))
    assert(lay.filter(_._3 == 7).map(t => (t._1, t._4)).toSeq == Seq((7, 0), (8, 1)))
  }

  /** Deterministic anisotropic corpus: dims 0..7 swing ±1000, the rest
    * ±10 — the natural contiguous layout puts every hot dim into
    * subspace 0. */
  private def anisotropic(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> CAST(CASE WHEN d < 8 " +
        "THEN pmod(xxhash64(id * 64 + d), 2001) - 1000 " +
        "ELSE pmod(xxhash64(id * 64 + d), 21) - 10 END AS BIGINT))").as("iv"))

  test("snake layout balances subspace energy vs the natural split") {
    val lay = OpqLayout.snakeLayout(energiesOf(anisotropic(64)))
    val grpE = lay.groupBy("grp").agg(sum("energy").as("e"))
      .collect().map(_.getLong(1))
    val natE = lay.withColumn("gnat", expr("d div 8"))
      .groupBy("gnat").agg(sum("energy").as("e"))
      .collect().map(_.getLong(1))
    val spread = (a: Array[Long]) => a.max - a.min
    info(s"snake spread ${spread(grpE)} vs natural ${spread(natE)}")
    assert(spread(grpE) < spread(natE) / 10,
      "snake layout should collapse the hot-subspace energy imbalance")
  }

  private def reconErr(base: DataFrame): Long = {
    val books = ProductQuantizer.booksN(spark, base)
    val codes = QuantKernels.encode(base, books, "sub", ProductQuantizer.Dsub)
    codes.join(base, "vec_id")
      .select(col("vec_id"), col("iv"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(books.select(col("sub"), col("cid").as("code"), col("cv"))),
        Seq("sub", "code"))
      .withColumn("e", expr(
        s"aggregate(zip_with(slice(iv, 1 + ${ProductQuantizer.Dsub} * sub, " +
          s"${ProductQuantizer.Dsub}), cv, (a, b) -> a - b), 0L, (acc, x) -> acc + x * x)"))
      .agg(sum("e")).head.getLong(0)
  }

  test("OPQ index option: frozen layout across admission and retrain, lower quant error") {
    import graft.operators.HybridIndex
    val n = 240L
    val cut = 180L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      expr("concat('w', CAST(id % 7 AS STRING), ' w', CAST(id % 11 AS STRING), " +
        "' w', CAST(id % 13 AS STRING), ' w', CAST(id % 17 AS STRING))").as("text"))
    val raw = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> CAST((CASE WHEN d < 8 " +
        "THEN pmod(xxhash64(id * 64 + d), 2001) - 1000 " +
        "ELSE pmod(xxhash64(id * 64 + d), 21) - 10 END) / 2000.0 AS FLOAT))").as("embedding"))
    val outN = tmpDir("idx_nat")
    val outO = tmpDir("idx_opq")
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), outN)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), outO, opq = true)
    val perm = HybridIndex.layoutPerm(spark, outO).get
    assert(perm.sorted.toSeq == (0 until 64), "stored layout must be a permutation")
    assert(HybridIndex.layoutPerm(spark, outN).isEmpty,
      "a default build must carry no layout")

    // Admission under the FROZEN layout (same slice into both indexes).
    HybridIndex.addBatch(spark, outN, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    HybridIndex.addBatch(spark, outO, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    // An ADMITTED row's stored vector equals the permuted original —
    // the admission leg permutes, not just the build leg.
    val admittedId = cut // first admitted vec
    val storedIv = spark.read.parquet(s"$outO/base.parquet")
      .where(col("vec_id") === admittedId)
      .head.getAs[scala.collection.Seq[Long]]("iv").toSeq
    val origIv = graft.queries.ExtQueries.intEmbeddingsFrom(raw)
      .where(col("vec_id") === admittedId)
      .head.getAs[scala.collection.Seq[Long]]("iv").toSeq
    assert(storedIv == perm.toSeq.map(origIv),
      "admitted vectors must land in the stored layout's space")

    // The headline: on the anisotropic corpus the OPQ index's measured
    // PQ quantization error beats the natural split's — the qx99 recon
    // win rendered at the INDEX level over the full committed base.
    val (cn, errN) = HybridIndex.quantErrMean(spark, outN)
    val (co, errO) = HybridIndex.quantErrMean(spark, outO)
    assert(cn == n && co == n, "both indexes must measure the full union corpus")
    info(s"index quant err natural $errN vs OPQ $errO")
    assert(errO < errN, s"OPQ index quant err $errO must beat natural $errN")

    // Serving covers the same queries, and retrain carries the layout
    // so post-flip admissions keep permuting.
    val qO = HybridIndex.search(spark, outO).select("qid").distinct().count()
    val qN = HybridIndex.search(spark, outN).select("qid").distinct().count()
    assert(qO == qN && qO > 0)
    val outO2 = tmpDir("idx_opq2")
    HybridIndex.retrain(spark, outO, outO2)
    assert(HybridIndex.layoutPerm(spark, outO2).get.toSeq == perm.toSeq,
      "retrain must carry the layout into the new directory")
    assert(HybridIndex.search(spark, outO2).collect().nonEmpty)
  }

  test("permuted PQ reconstructs anisotropic vectors better than natural") {
    val base = anisotropic(200)
    val perm = OpqLayout.collectPerm(OpqLayout.snakeLayout(energiesOf(base)))
    assert(perm.sorted.toSeq == (0 until 64), "perm must be a permutation")
    val errNat = reconErr(base)
    val errOpq = reconErr(OpqLayout.permute(base, perm))
    info(s"recon error natural $errNat vs snake-permuted $errOpq")
    assert(errOpq < errNat,
      "balanced subspaces must reconstruct the anisotropic corpus better")
    // The win should be structural, not marginal: one 16-centroid
    // codebook over eight ±1000 dims cannot compete with eight codebooks
    // holding one hot dim each.
    assert(errOpq * 2 < errNat, s"expected ≥2× error reduction, got $errNat → $errOpq")
  }
}
