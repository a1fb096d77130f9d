package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
  * compressed-vector codec behind qx42 (exhaustive ADC) and qx43
  * (IVF-PQ), factored here so the recall fixture measures the same
  * artifacts the gate queries ship.
  *
  * Geometry: 64 dims split into [[M]] = 8 subspaces of [[Dsub]] = 8,
  * each quantized against its own [[Ksub]] = 16-centroid codebook
  * trained with 2 per-subspace Lloyd iterations
  * ([[IvfAnn.trainedCentroids]] over the slice — integer-exact, so the
  * DuckDB oracle replays the training); a 512-byte vector becomes 8
  * 4-bit codes. Queries carry 128-entry lookup tables (per sub × code:
  * ‖c‖² − 2·q_sub·c, the L2 surrogate with the per-query constant
  * dropped); scoring is the codegen'd `pq_adc` kernel — 8 lookups +
  * adds per (vector, query).
  */
object ProductQuantizer {

  val M = 8
  val Dsub = 8
  val Ksub = 16L

  /** Per-subspace trained codebooks (cid, sub, cv(8), cn2):
    * quadratic-residue seeds (salt 37, absolute dims) refined by 2 Lloyd
    * steps over that subspace's slice — the qx16 training discipline per
    * subspace.
    *
    * All M subspaces train in ONE joint Lloyd loop: per iteration, one
    * broadcast crossJoin scores every (vector, sub, cid), one aggregation
    * takes the per-(vector, sub) argmin, one aggregation means the
    * assigned slice values per (sub, cid, dim), and ONE M·ksub-row
    * collect rebuilds the codebook LocalRelation — 2 driver round-trips
    * total. The math is bit-identical to M independent
    * [[IvfAnn.trainedCentroids]] loops (same argmin tie-break, same
    * truncating integer mean, same empty-cluster fallback — the oracle
    * replays either spelling), but the per-subspace spelling cost M×iters
    * sequential Spark jobs, which at bench sf was the entire cost of the
    * PQ family (qx42 5.7 s → the scan itself is milliseconds). */
  def booksN(spark: SparkSession, base: DataFrame, ksub: Long = Ksub): DataFrame = {
    // Since round 10 each Lloyd iteration is [[QuantKernels.lloydIter]]
    // (one mapPartitions pass) instead of the n·M·Ksub broadcast
    // crossJoin; bit-identical to [[booksNCrossJoin]]
    // (QuantKernelsSpec) and to M independent trainedCentroids loops.
    // Size-gated shared train loop (round 17): driver-local replay below
    // the gate, the per-iteration lloydIter fold past it — same math.
    val trained = QuantKernels.trainLoop(
      base.select("vec_id", "iv"), pqSeeds(spark, ksub), "sub", Dsub, iters = 2)
    trained.withColumn("cn2", expr("long_dot(cv, cv)"))
  }

  private def pqSeeds(spark: SparkSession, ksub: Long): DataFrame =
    spark.range(ksub * M).select(
      (col("id") % ksub).as("cid"), (col("id") / ksub).cast("int").as("sub"),
      expr(s"transform(sequence(0, ${Dsub - 1}), j -> " +
        s"((((id % $ksub) * 1000003 + ((id div $ksub) * $Dsub + j) * 97 + 37) % 2147483647) * " +
        s"(((id % $ksub) * 1000003 + ((id div $ksub) * $Dsub + j) * 97 + 37) % 2147483647)) " +
        "% 2147483647 % 2001 - 1000)").as("cv"))

  /** The declarative spelling of [[booksN]], kept as the spec
    * reference the kernel is pinned against. */
  private[graft] def booksNCrossJoin(spark: SparkSession, base: DataFrame,
                                     ksub: Long = Ksub): DataFrame = {
    val seeds = pqSeeds(spark, ksub)
    val trained = (1 to 2).foldLeft(seeds) { (books, _) =>
      val withN = books.withColumn("cn2", expr("long_dot(cv, cv)"))
      val asg = base.select("vec_id", "iv").crossJoin(broadcast(withN))
        .select(col("vec_id"), col("sub"), col("cid"),
          (lit(2L) * expr(s"long_dot(slice(iv, 1 + $Dsub * sub, $Dsub), cv)")
            - col("cn2")).as("sc"))
        .groupBy("vec_id", "sub")
        .agg(max(struct(col("sc"), (-col("cid")).as("negcid"))).as("best"))
        .select(col("vec_id"), col("sub"), (-col("best.negcid")).as("cid"))
      val means = base.select(col("vec_id"), posexplode(col("iv")).as(Seq("d", "v")))
        .withColumn("sub", expr(s"d div $Dsub").cast("int"))
        .join(asg, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("cid"), expr(s"d % $Dsub").as("j"))
        .agg(expr("sum(v) div count(1)").as("m"))
        .groupBy("sub", "cid")
        .agg(expr("transform(array_sort(collect_list(struct(j, m))), p -> p.m)").as("tcv"))
      val step = books.select("cid", "sub", "cv").join(means, Seq("sub", "cid"), "left")
        .select(col("cid"), col("sub"), coalesce(col("tcv"), col("cv")).as("cv"))
      spark.createDataFrame(java.util.Arrays.asList(step.collect(): _*), step.schema)
    }
    trained.withColumn("cn2", expr("long_dot(cv, cv)"))
  }

  /** Encode: ONE broadcast crossJoin (M·Ksub codebook rows) + ONE
    * aggregation with M conditional argmins (the imiCells pattern widened
    * to M) → (vec_id, codes ARRAY(M)) — the 4-byte-per-vector compressed
    * corpus. */
  def packed(base: DataFrame, booksN: DataFrame): DataFrame =
    QuantKernels.encode(base.select("vec_id", "iv"),
      booksN.select("cid", "sub", "cv"), "sub", Dsub)

  /** [[packed]] with the cell column riding the kernel pass — the
    * residual system's coded corpus (vec_id, cell, codes) with no
    * join-back (round 18; bit-identical to packed ⋈ cell, spec-pinned). */
  def packedWithCell(base: DataFrame, booksN: DataFrame): DataFrame =
    QuantKernels.encodeWithCell(base.select("vec_id", "cell", "iv"),
      booksN.select("cid", "sub", "cv"), "sub", Dsub)

  /** The declarative spelling of [[packed]], kept as the spec
    * reference the kernel is pinned against. */
  private[graft] def packedCrossJoin(base: DataFrame, booksN: DataFrame): DataFrame = {
    val subScores = base.select("vec_id", "iv").crossJoin(broadcast(booksN))
      .select(col("vec_id"), col("sub"), col("cid"),
        (lit(2L) * expr(s"long_dot(slice(iv, 1 + $Dsub * sub, $Dsub), cv)")
          - col("cn2")).as("sc"))
    val codeAggs = (0 until M).map(m =>
      max(when(col("sub") === m,
        struct(col("sc"), (-col("cid")).as("negcid")))).as(s"b$m"))
    subScores.groupBy("vec_id")
      .agg(codeAggs.head, codeAggs.tail: _*)
      .select(col("vec_id"),
        array((0 until M).map(m => -col(s"b$m.negcid")): _*).as("codes"))
  }

  /** Per-query ADC tables, packed as one M·Ksub-entry array indexed
    * sub·Ksub + code — broadcast for the whole query set. Expects
    * (qid, qiv) columns. */
  def luts(q: DataFrame, booksN: DataFrame): DataFrame =
    lutsKeyed(q, booksN, Seq("qid"))

  /** [[luts]] with a caller-chosen grouping key — the residual system
    * (qx44) builds one table per (query, probed cell), since the query's
    * residual differs per cell. */
  def lutsKeyed(q: DataFrame, booksN: DataFrame, keyCols: Seq[String]): DataFrame =
    q.crossJoin(broadcast(booksN))
      .select(keyCols.map(col) ++ Seq(col("sub"), col("cid").as("code"),
        (col("cn2") - lit(2L) *
          expr(s"long_dot(slice(qiv, 1 + $Dsub * sub, $Dsub), cv)")).as("part")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(expr("transform(array_sort(collect_list(struct(sub, code, part)))," +
        " p -> p.part)").as("lutarr"))
}
