package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfAnn

/** Round-3 ADVICE (medium): the centroid hash squared its raw Horner value,
  * overflowing signed 64-bit past cid ≈ 3037 — an ANSI-mode
  * ArithmeticException at exactly the corpus sizes (n > ~194k) the IVF
  * index exists for, and a silent MaxCentroids ceiling at ~3k. The fix
  * reduces mod p before squaring ((h mod p)² ≡ h² (mod p), so values are
  * unchanged where both are exact). This spec pins:
  *   (a) the full MaxCentroids centroid table evaluates without error,
  *   (b) the reduced form equals the exact BigInt value everywhere,
  *   (c) per-query probe work stays flat while K tracks n (the
  *       single-level design contract below the MaxCentroids knee).
  */
class IvfAnnSpec extends SparkTestBase {

  test("centroids(MaxCentroids) evaluates without overflow, values in range") {
    // ANSI mode ON so any 64-bit overflow in the hash is an error, not a wrap
    // (Spark 4 defaults to ANSI; pin it anyway so the spec can't rot).
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val stats = IvfAnn.centroids(spark, IvfAnn.MaxCentroids)
        .select(explode(col("cv")).as("v"))
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
        .head()
      assert(stats.getLong(0) == IvfAnn.MaxCentroids * 64)
      assert(stats.getLong(1) >= -1000L && stats.getLong(2) <= 1000L)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("reduced-before-square hash is exact: matches BigInt arithmetic") {
    val p = BigInt(2147483647L)
    def exact(c: Long, d: Long): Long = {
      val h = BigInt(c) * 1000003 + BigInt(d) * 97 + 13
      ((h * h) mod p mod 2001).toLong - 1000L
    }
    // Sample cids spanning the old overflow boundary (~3037) up to the cap.
    val cids = Seq(0L, 1L, 3036L, 3037L, 3038L, 40000L, IvfAnn.MaxCentroids - 1)
    val got = IvfAnn.centroids(spark, IvfAnn.MaxCentroids)
      .where(col("cid").isin(cids: _*))
      .select(col("cid"), col("cv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    for (c <- cids; d <- 0 until 64)
      assert(got(c)(d) == exact(c, d), s"centroid value diverges at cid=$c d=$d")
  }

  test("IMI: per-level K derivation in lockstep with the oracle SQL; knee math") {
    // Scala: 1 << ((floorLog2(m) + 1) / 2). SQL: 1 << (length(bin(m)) // 2).
    // length(bin(m)) = floorLog2(m) + 1, so the two are identical — pin it.
    for (n <- Seq(0L, 100L, 2000L, 200000L, 4200000L, 1000000000L, 270000000000000L)) {
      val m = math.max(n / IvfAnn.TargetListSize, 2L)
      val sqlForm = 1L << (java.lang.Long.toBinaryString(m).length / 2)
      val clamped = math.min(IvfAnn.MaxCentroids, math.max(IvfAnn.MinCentroids, sqlForm))
      assert(IvfAnn.imiCentroidsFor(n) == clamped, s"derivations diverge at n=$n")
    }
    // K² ∈ (m/2, 2m] (K rounds b/2 to a power of two): expected cell
    // occupancy in [TargetListSize/2, 2·TargetListSize) below the clamp.
    for (n <- Seq(10000L, 1000000L, 100000000L, 10000000000L)) {
      val m = math.max(n / IvfAnn.TargetListSize, 2L)
      val k = IvfAnn.imiCentroidsFor(n)
      if (k < IvfAnn.MaxCentroids)
        assert(k * k > m / 2 && k * k <= 2 * m, s"K²=${k * k} outside (m/2, 2m] at n=$n (m=$m)")
    }
    // The knee moves: the flat index saturates at MaxCentroids·64 ≈ 4.2M,
    // the IMI at MaxCentroids²·64 ≈ 2.7e14.
    assert(IvfAnn.imiCentroidsFor(IvfAnn.MaxCentroids * IvfAnn.MaxCentroids * 64) == IvfAnn.MaxCentroids)
    assert(IvfAnn.imiCentroidsFor(4200000L) < IvfAnn.MaxCentroids)
  }

  test("IMI: product cells partition the corpus; per-query candidates bounded") {
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 2000001) - 1000000 AS BIGINT))").as("iv"))
    val n = 8192L
    val k = IvfAnn.imiCentroidsFor(n)
    val books = IvfAnn.imiCodebooks(spark, k)
    val cells = IvfAnn.imiCells(corpus(n), books, k)
    // Every vector gets exactly one cell, and cell ids stay inside [0, K²).
    assert(cells.count() == n)
    val span = cells.agg(min("cell"), max("cell")).head
    assert(span.getLong(0) >= 0L && span.getLong(1) < k * k)
    // 2×2 probes: mean per-query candidate count ≈ 4 · n/K² — bounded well
    // under brute force (n).
    val q = corpus(n).where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    val cand = IvfAnn.imiProbeCells(q, books, k).join(cells, "cell")
      .where(col("vec_id") =!= col("qid"))
    val perQuery = cand.count().toDouble / q.count()
    info(f"mean IMI candidates per query: $perQuery%.1f (n=$n, K=$k, cells=${k * k})")
    assert(perQuery < n / 4.0, s"IMI probes $perQuery of $n — not selective")
  }

  test("per-query probe candidates stay flat while K tracks n") {
    // Deterministic pseudo-random integer vectors (same quantized range as
    // the real table), no driver-side data.
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 2000001) - 1000000 AS BIGINT))").as("iv"))

    val meanCands = Seq(1024L, 4096L, 16384L).map { n =>
      val k = IvfAnn.centroidsFor(n)
      val cents = IvfAnn.centroids(spark, k)
      val base = corpus(n)
      val assign = IvfAnn.assignments(base, cents)
      val q = base.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      val cand = IvfAnn.probes(q, cents, nprobe = 2).join(assign, "cid")
        .where(col("vec_id") =!= col("qid"))
      val perQuery = cand.count().toDouble / q.count()
      n -> perQuery
    }
    info(s"mean probe candidates per query: $meanCands")
    // Design contract: ≈ nprobe · n/K = 2 · TargetListSize = 128, FLAT in n
    // (pseudo-random centroids make lists uneven — allow a wide band — but
    // growth across 16× corpus must be nowhere near 16×).
    val ratio = meanCands.last._2 / meanCands.head._2
    assert(ratio < 4.0, s"per-query candidates grew ${ratio}x over 16x corpus — list length not flat")
    meanCands.foreach { case (n, c) =>
      assert(c > 8 && c < 2048, s"n=$n: mean per-query candidates $c outside sane band")
    }
  }

  test("k-means: K derivation in oracle lockstep; training cost stays n^1.5") {
    // Scala 1 << ((floorLog2(n)+1)/2) vs SQL 1 << (length(bin(n)) // 2).
    for (n <- Seq(0L, 100L, 500L, 5000L, 200000L, 1000000000L)) {
      val m = math.max(n, 2L)
      val sqlForm = 1L << (java.lang.Long.toBinaryString(m).length / 2)
      val clamped = math.min(IvfAnn.MaxCentroids, math.max(IvfAnn.MinCentroids, sqlForm))
      assert(IvfAnn.kmeansCentroidsFor(n) == clamped, s"derivations diverge at n=$n")
    }
    // K ≈ √n: K² ∈ (n/2, 2n] below the clamp — one training pass costs
    // n·K ≈ n^1.5 dots, never the quadratic n²/64 a K = n/64 sizing gives.
    for (n <- Seq(10000L, 1000000L, 100000000L)) {
      val k = IvfAnn.kmeansCentroidsFor(n)
      if (k < IvfAnn.MaxCentroids)
        assert(k * k > n / 2 && k * k <= 2 * n, s"K=$k not √n-shaped at n=$n")
    }
  }

  test("trained IMI: half-codebooks cut per-level quantization cost; cells still partition") {
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 1000001) - 500000 AS BIGINT))").as("iv"))
    val n = 4096L
    val emb = corpus(n)
    val k = IvfAnn.imiCentroidsFor(n)
    val hashed = IvfAnn.imiCodebooks(spark, k)
    val trained = IvfAnn.trainedImiCodebooks(emb, k, iters = 2)
    // Schema contract: same (cid, lvl, cv(32)) shape the consumers read.
    val rows = trained.collect()
    assert(rows.length == 2 * k)
    assert(trained.select("lvl").distinct().count() == 2)
    assert(rows.forall(_.getAs[scala.collection.Seq[Long]]("cv").length == 32))
    // Per-level L2 quantization cost must drop vs the hashed seeds.
    def levelCost(books: org.apache.spark.sql.DataFrame, lvl: Int): Long = {
      val half = emb.select(col("vec_id"), expr(s"slice(iv, ${1 + 32 * lvl}, 32)").as("iv"))
      val cents = books.where(col("lvl") === lvl).select("cid", "cv")
      val withN = cents.withColumn("cn2", expr("long_dot(cv, cv)"))
      half.withColumn("n2", expr("long_dot(iv, iv)"))
        .join(IvfAnn.l2Assignments(half, cents), "vec_id")
        .join(withN, "cid")
        .select((col("n2") - lit(2L) * expr("long_dot(iv, cv)") + col("cn2")).as("c"))
        .agg(sum("c")).head().getLong(0)
    }
    for (lvl <- 0 to 1)
      assert(levelCost(trained, lvl) < levelCost(hashed, lvl),
        s"level $lvl: training did not reduce quantization cost")
    // L2 product cells still partition the corpus, ids in [0, K²).
    val cells = IvfAnn.imiCellsL2(emb, trained, k)
    assert(cells.count() == n && cells.select("vec_id").distinct().count() == n)
    val span = cells.agg(min("cell"), max("cell")).head
    assert(span.getLong(0) >= 0L && span.getLong(1) < k * k)
  }

  test("k-means: Lloyd steps move centroids into the data, assignment total") {
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 1000001) - 500000 AS BIGINT))").as("iv"))
    val n = 4096L
    val emb = corpus(n)
    val k = IvfAnn.kmeansCentroidsFor(n)
    val seeds = IvfAnn.centroids(spark, k)
    val trained = IvfAnn.trainedCentroids(emb, seeds, iters = 2)
    // Codebook stays complete: K rows, 64 dims each, and training moved
    // the centroids out of the seeds' ±1000 box into the data's range.
    val rows = trained.select(col("cid"), col("cv")).collect()
    assert(rows.length == k)
    assert(rows.forall(_.getSeq[Long](1).length == 64))
    assert(rows.exists(_.getSeq[Long](1).exists(v => math.abs(v) > 1000L)),
      "no centroid left the seed range — Lloyd update did not run")
    // Every vector lands in exactly one list.
    val asg = IvfAnn.l2Assignments(emb, trained)
    assert(asg.count() == n)
    assert(asg.select("vec_id").distinct().count() == n)
    // The trained index must quantize better than the seeds: total
    // within-cluster L2 cost (Σ ‖x‖²−2x·c+‖c‖² over assignments) drops.
    def cost(cents: org.apache.spark.sql.DataFrame): Long = {
      val withN = cents.withColumn("cn2", expr("long_dot(cv, cv)"))
      emb.withColumn("n2", expr("long_dot(iv, iv)"))
        .join(IvfAnn.l2Assignments(emb, cents), "vec_id")
        .join(withN, "cid")
        .select((col("n2") - lit(2L) * expr("long_dot(iv, cv)") + col("cn2")).as("c"))
        .agg(sum("c")).head().getLong(0)
    }
    val seedCost = cost(seeds)
    val trainedCost = cost(trained)
    assert(trainedCost < seedCost,
      s"training did not reduce quantization cost: $trainedCost >= $seedCost")
  }

  test("ranked probe: pmax <= p is exactly the perLevel = p probe set (budget nesting)") {
    // qx124's one-ADC-pass restructure rests on this: the perLevel-3
    // ranked probe filtered to pmax <= p must be bit-identical to the
    // plain perLevel-p probe, for every p on the curve.
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 2000001) - 1000000 AS BIGINT))").as("iv"))
    val n = 2048L
    val k = IvfAnn.imiCentroidsFor(n)
    val books = IvfAnn.imiCodebooks(spark, k)
    val q = corpus(n).where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    val ranked = IvfAnn.imiProbeCellsL2Ranked(q, books, k, perLevel = 3).cache()
    for (p <- Seq(1, 2, 3)) {
      val fromRanked = ranked.where(col("pmax") <= p).select("qid", "cell")
      val plain = IvfAnn.imiProbeCellsL2(q, books, k, perLevel = p)
      assert(fromRanked.exceptAll(plain).isEmpty && plain.exceptAll(fromRanked).isEmpty,
        s"perLevel=$p: ranked probe set diverges from the plain probe")
    }
    ranked.unpersist()
  }
}
