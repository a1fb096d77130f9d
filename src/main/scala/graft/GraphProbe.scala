package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingLsh, GraphAnn}

/** Scale probe for the graph-ANN family (qx109/qx110): at a probe
  * corpus, time (a) the full k-NN-graph build, (b) incremental
  * admission of a `1/deltaMod` delta into the base-only graph
  * (signatures precomputed — the stored-asset assumption admit
  * states), and (c) the full rebuild the admission replaces, plus the
  * touched-node count that decides the regime: touched ≈ delta × 8
  * bands × bucket occupancy (~n/2^p, i.e. ~32-49 under planesFor), so
  * incremental wins only when delta ≪ n/400 — the steady-ingest
  * regime — and a bulk delta should just rebuild. Measured at 50k
  * random vectors: delta 14% → touched 100%, admit 20-30 s vs rebuild
  * 13.5 s (rebuild wins, as the analysis predicts); delta 0.1% →
  * touched 38%, admit 8.5-10 s vs rebuild 12.7 s (incremental wins
  * 1.5×). Recorded in SURVEY §8.2 qx110.
  *
  * Usage: runMain graft.GraphProbe (<dir>|gen:<n>) [reps] [deltaMod]
  * Prints one JSON line.
  *
  * `gen:<n>` synthesizes n RANDOM vectors (ProbeGen's noise term
  * alone) — the gate corpus's regime. The PLANTED-cluster probe corpus
  * is deliberately not used here: near-identical cluster members share
  * most hyperplane signs, so LSH buckets go quadratic — the known
  * failure mode the capped/celled dedup family (qx50) exists for; the
  * kNN-graph build inherits it through its candidate generator, which
  * at clustered 100 TB means capping bucket fan-out or building from
  * IVF cells instead (documented, not probed). */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val deltaMod = if (args.length > 2) args(2).toLong else 7L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val raw =
      if (dir.startsWith("gen:")) {
        val n = dir.drop(4).toLong
        spark.range(0, n, 1, 64).select(col("id").as("vec_id"))
          .withColumn("embedding", expr(
            """transform(sequence(0, 63), d -> CAST(
              |  ((vec_id * 1009 + d * 31 + 3) * 2654435761 % 2147483647 % 721 - 360) / 1000.0
              |AS FLOAT))""".stripMargin))
      } else spark.read.parquet(s"$dir/embeddings.parquet")
    val base = queries.ExtQueries.intEmbeddingsFrom(raw).localCheckpoint()
    val n = base.count()
    val sigs = EmbeddingLsh.bandSigs(base.select("vec_id", "iv"),
      EmbeddingLsh.planesFor(n)).localCheckpoint() // the stored asset
    val deltaIds = base.where(pmod(col("vec_id"), lit(deltaMod)) === 3L)
      .select(col("vec_id").as("id")).localCheckpoint()
    val nDelta = deltaIds.count()
    val baseSigs = sigs.join(deltaIds.withColumnRenamed("id", "vec_id"),
      Seq("vec_id"), "left_anti").localCheckpoint()
    val baseOnly = base.join(deltaIds.withColumnRenamed("id", "vec_id"),
      Seq("vec_id"), "left_anti")

    val (oldGraph, buildSec) = time {
      GraphAnn.knnGraph(baseOnly, EmbeddingLsh.candidatePairs(baseSigs), 4)
        .localCheckpoint()
    }
    val baseEdges = oldGraph.count()

    val admitSecs = (1 to reps).map { _ =>
      time(GraphAnn.admit(base, sigs, oldGraph, deltaIds, 4).count())._2
    }
    val (rebuildEdges, rebuildSec) = time {
      GraphAnn.knnGraph(base, EmbeddingLsh.candidatePairs(sigs), 4).count()
    }
    // touched fraction: nodes sharing a bucket with the delta
    val dBuckets = sigs.join(deltaIds.withColumnRenamed("id", "vec_id"), "vec_id")
      .select(col("band"), col("sig")).distinct()
    val touched = sigs.join(broadcast(dBuckets), Seq("band", "sig"))
      .select("vec_id").distinct().count()

    println(s"""{"n":$n,"n_delta":$nDelta,"base_edges":$baseEdges,""" +
      s""""build_sec":${"%.2f".format(buildSec)},""" +
      s""""admit_sec":[${admitSecs.map(s => "%.2f".format(s)).mkString(",")}],""" +
      s""""rebuild_sec":${"%.2f".format(rebuildSec)},"rebuild_edges":$rebuildEdges,""" +
      s""""touched":$touched,"sf":"$dir"}""")
    spark.stop()
  }
}
