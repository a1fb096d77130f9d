package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IvfAnn
import graft.sources.Tables

/** SemDeDup (qx50) quality, MEASURED against brute-force ground truth —
  * the fixture discipline: cluster-scoping trades recall for the n·√n
  * candidate bound, so the trade is quantified, not argued. Precision is
  * exact by construction (every emitted pair's cosine is computed
  * exactly), and the recall lost to cross-cluster pairs is recoverable
  * with multi-assignment (each vector indexed under its nprobe nearest
  * cells — the IVF nprobe knob applied to dedup), which this spec also
  * measures and orders.
  */
class SemDedupSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val Tau = 0.35

  private def base: DataFrame = Tables.embeddings(spark, dir).select(
    col("vec_id"),
    expr("transform(embedding, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))").as("iv"))
    .withColumn("n2", expr("long_dot(iv, iv)"))

  /** Brute-force drop set: every doc with ANY lower-id neighbor whose
    * exact cosine clears the threshold — the all-pairs oracle the
    * cluster scoping approximates. */
  private lazy val truthDrop: Set[Long] = {
    val x = base.select(col("vec_id").as("pid"), col("iv").as("xiv"), col("n2").as("xn2"))
    base.join(x, col("pid") < col("vec_id"))
      .withColumn("dot", expr("long_dot(iv, xiv)"))
      .withColumn("cosine", expr(
        "CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(xn2 AS DOUBLE)))"))
      .where(col("cosine") >= Tau)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
  }

  /** Drop set found when pair search is scoped to shared cells, with
    * each vector indexed under its `nprobe` nearest trained centroids
    * (nprobe = 1 is exactly qx50's single-assignment scoping). */
  private def scopedDrop(nprobe: Int): Set[Long] = {
    val b = base
    val k = IvfAnn.kmeansCentroidsFor(b.count())
    val cents = IvfAnn.trainedCentroids(b, IvfAnn.centroids(spark, k), iters = 2)
    val cells =
      if (nprobe == 1) IvfAnn.l2Assignments(b, cents)
      else IvfAnn.l2Probes(
        b.select(col("vec_id").as("qid"), col("iv").as("qiv")), cents, nprobe)
        .select(col("qid").as("vec_id"), col("cid"))
    val m = cells.join(b, "vec_id")
    val a = m.select(col("cid"), col("vec_id").as("pid"),
      col("iv").as("xiv"), col("n2").as("xn2"))
    m.join(a, "cid")
      .where(col("pid") < col("vec_id"))
      .select("vec_id", "pid", "iv", "n2", "xiv", "xn2").distinct() // dedup multi-cell co-residents
      .withColumn("dot", expr("long_dot(iv, xiv)"))
      .withColumn("cosine", expr(
        "CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(xn2 AS DOUBLE)))"))
      .where(col("cosine") >= Tau)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
  }

  test("qx50 drops only true duplicates (exact precision) and recall is measured") {
    val got = graft.queries.ExtQueries.qx50(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(truthDrop),
      s"false drops: ${(got -- truthDrop).take(5)} — scoped cosines must be exact")
    val recall = got.size.toDouble / truthDrop.size
    info(f"qx50 (2-probe) recall: ${got.size}/${truthDrop.size} = $recall%.3f")
    // The floor is corpus-calibrated (random vectors, tau at the noise
    // ceiling — a real embedding space clusters far harder). Measured
    // 0.31 single-assignment / 0.64 with the 2-probe indexing the gate
    // ships; the floor pins the multi-probe gain as load-bearing.
    assert(recall >= 0.5, f"2-probe scoping collapsed: recall $recall%.3f")
    assert(got == scopedDrop(2), "gate must equal the spec's 2-probe derivation")
  }

  test("multi-assignment (nprobe=2) strictly widens the single-assignment drop set") {
    val single = scopedDrop(1)
    val multi = scopedDrop(2)
    assert(single.subsetOf(multi),
      "a shared top-1 cell is a shared top-2 cell — single must be contained")
    assert(multi.subsetOf(truthDrop), "multi-probe must stay exact-precision")
    val r1 = single.size.toDouble / truthDrop.size
    val r2 = multi.size.toDouble / truthDrop.size
    info(f"recall: nprobe=1 $r1%.3f -> nprobe=2 $r2%.3f (truth ${truthDrop.size})")
    assert(r2 >= r1)
  }
}
