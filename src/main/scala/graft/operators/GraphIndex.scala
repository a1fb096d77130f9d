package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED kNN-graph + communities asset, maintained NEXT TO a
  * [[HybridIndex]] by the standing door (round 13, r12 verdict #3 —
  * the qx110/qx102 primitives composed into the live maintenance loop
  * the way the retrain flip runs for codebooks).
  *
  * Layout under `graphDir`:
  *   - `meta.parquet` — one row (planes, k, lpa_iters): the PINNED
  *     plane schedule (qx110's capacity-planning precondition — planes
  *     derived from the EXPECTED final corpus size at init, never the
  *     running size; under it admit == rebuild bit-for-bit) plus the
  *     graph degree and the init-time LPA round count.
  *   - `sigs/seg=<key>/` — band signatures, append-only one segment
  *     per admission (a vector's sigs never change under pinned
  *     planes, so the union is always consistent; re-delivery
  *     overwrites its own segment with identical bytes).
  *   - `v=<N>/graph.parquet` (u, v, cos) + `labels.parquet`
  *     (u, label) + `info.parquet` (seg) — immutable versioned
  *     snapshots, committed stage-then-rename (the HybridIndex
  *     manifest discipline): a crash mid-stage leaves only
  *     `_staging_*` garbage; a re-delivered `b<batchId>` admission
  *     finds its seg key already recorded and no-ops instead of
  *     minting a duplicate version.
  *
  * Scale shape per admission: delta sigs are map-side (delta ×
  * planes dot products); the touched set comes from broadcasting the
  * DELTA's buckets against the union sigs; only touched nodes' top-K
  * recompute ([[GraphAnn.admit]]); the community refresh is a
  * warm-started synchronous LPA pass — per round one hash join of the
  * edge list against the labels (the PageRank iteration class), whose
  * fixpoint property (spec-pinned) means a small delta moves only
  * labels near the new nodes. Nothing rescans vectors outside the
  * delta's collision neighborhood. */
object GraphIndex {

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def versionsOf(spark: SparkSession, graphDir: String): Seq[Long] = {
    val f = fs(spark, graphDir)
    val p = new org.apache.hadoop.fs.Path(graphDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).toSeq.sorted
  }

  private def admittedSegs(spark: SparkSession, graphDir: String): Set[String] =
    versionsOf(spark, graphDir).map { v =>
      spark.read.parquet(s"$graphDir/v=$v/info.parquet").head.getString(0)
    }.toSet

  /** Stage-then-rename commit of one immutable snapshot version.
    * `committed_ms` rides in info.parquet — commit metadata, not query
    * data (the HybridIndex manifest discipline): [[vacuum]]'s
    * supersede-time grace reads it so no retirement decision ever
    * trusts filesystem mtime. */
  private def commitVersion(spark: SparkSession, graphDir: String, v: Long,
                            seg: String, graph: DataFrame,
                            labels: DataFrame): Unit = {
    import spark.implicits._
    val f = fs(spark, graphDir)
    val staging = s"$graphDir/_staging_v$v"
    graph.write.mode("overwrite").parquet(s"$staging/graph.parquet")
    labels.write.mode("overwrite").parquet(s"$staging/labels.parquet")
    Seq((seg, System.currentTimeMillis())).toDF("seg", "committed_ms")
      .write.mode("overwrite").parquet(s"$staging/info.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$graphDir/v=$v")
    if (f.exists(dst)) { // lost race / re-delivery landed first: drop ours
      f.delete(new org.apache.hadoop.fs.Path(staging), true)
    } else if (!f.rename(new org.apache.hadoop.fs.Path(staging), dst)) {
      f.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw new java.io.IOException(s"GraphIndex commit v=$v lost its rename")
    }
  }

  private def unionSigs(spark: SparkSession, graphDir: String): DataFrame =
    spark.read.parquet(s"$graphDir/sigs").select("vec_id", "band", "sig")

  /** Build v=0 over the index's CURRENT committed base. `expectedFinal`
    * pins the plane schedule for the asset's whole life (qx110's
    * precondition — size it for the corpus you plan to serve, the
    * capacity-planning discipline). */
  def init(spark: SparkSession, indexDir: String, graphDir: String,
           expectedFinal: Long, k: Int = 4, lpaIters: Int = 4): Unit = {
    import spark.implicits._
    val planes = EmbeddingLsh.planesFor(expectedFinal)
    Seq((planes, k, lpaIters)).toDF("planes", "k", "lpa_iters")
      .write.mode("overwrite").parquet(s"$graphDir/meta.parquet")
    val base = HybridIndex.committedBase(spark, indexDir)
    val sigs = EmbeddingLsh.bandSigs(base.select("vec_id", "iv"), planes)
    sigs.write.mode("overwrite").parquet(s"$graphDir/sigs/seg=init")
    val sigsP = spark.read.parquet(s"$graphDir/sigs/seg=init")
    val pairs = EmbeddingLsh.candidatePairs(sigsP).localCheckpoint()
    val graph = GraphAnn.knnGraph(base, pairs, k).localCheckpoint()
    // communities vote over the CANDIDATE graph (qx102's edge set —
    // denser than the k-out kNN graph, whose sparsity leaves synchronous
    // LPA oscillating; on collision edges the labeling reaches the
    // fixpoint LabelPropagationSpec pins)
    val labels = LabelPropagation.run(base.select(col("vec_id").as("u")),
      pairs.select(col("vec_a").as("u"), col("vec_b").as("v")), lpaIters)
    commitVersion(spark, graphDir, 0L, "init", graph, labels)
  }

  /** Admit one delta (the door's admitted micro-batch, already
    * committed into the index) under segment key `seg` — no-op if a
    * version already records `seg` (re-delivered batch). One
    * warm-started LPA round refreshes communities from the previous
    * version's fixpoint. */
  def admit(spark: SparkSession, indexDir: String, graphDir: String,
            deltaIds: DataFrame, seg: String): Unit = {
    if (admittedSegs(spark, graphDir).contains(seg)) return
    val meta = spark.read.parquet(s"$graphDir/meta.parquet").head
    val (planes, k, lpaIters) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val vs = versionsOf(spark, graphDir)
    require(vs.nonEmpty, s"GraphIndex.admit before init under $graphDir")
    val prev = vs.max
    // base is a lineage-free parquet read — never materialized here;
    // only the (small) delta id set is pinned
    val base = HybridIndex.committedBase(spark, indexDir)
    val dIds = deltaIds.select(col("id")).localCheckpoint()
    // delta sigs from the committed union base (narrow id-join), under
    // the pinned schedule; idempotent segment overwrite
    EmbeddingLsh.bandSigs(
        base.join(dIds.withColumnRenamed("id", "vec_id"), "vec_id")
          .select("vec_id", "iv"), planes)
      .write.mode("overwrite").parquet(s"$graphDir/sigs/seg=$seg")
    val sigs = unionSigs(spark, graphDir)
    val oldGraph = spark.read.parquet(s"$graphDir/v=$prev/graph.parquet")
    val graph = GraphAnn.admit(base, sigs, oldGraph, dIds, k).localCheckpoint()
    // warm-started re-propagation over the union CANDIDATE graph (the
    // qx102 edge set — see init): full round count for convergence,
    // but each round starts from the previous fixpoint, so label churn
    // is confined to the delta's neighborhood (spec-pinned fixpoint)
    val labels = LabelPropagation.run(base.select(col("vec_id").as("u")),
      EmbeddingLsh.candidatePairs(sigs)
        .select(col("vec_a").as("u"), col("vec_b").as("v")),
      iters = lpaIters,
      init = Some(spark.read.parquet(s"$graphDir/v=$prev/labels.parquet")))
    commitVersion(spark, graphDir, prev + 1L, seg, graph, labels)
  }

  /** Retire superseded snapshot versions past a grace period — each
    * version holds a full n·K-edge graph copy, so a standing door
    * grows storage one copy per admitted batch without this. The
    * HybridIndex supersede-time rule, one asset over: a non-latest
    * version stays protected until `graceMs` has passed since the
    * NEXT version's recorded commit (a reader that resolved it gets
    * the full grace from the moment it was superseded — never an
    * mtime guess against a skewed clock), and crash-orphaned
    * `_staging_*` dirs are collected by stage-time mtime grace (the
    * only record an uncommitted writer leaves). The append-only
    * `sigs/` segments are NEVER vacuumed — every vector's signature is
    * immutable under the pinned planes and shared by all versions.
    * A seg key whose version was retired CAN re-admit on a
    * beyond-grace replay, but [[GraphAnn.admit]] over a base/sig
    * union that already contains the delta recomputes the identical
    * graph — a redundant version with identical content, never a
    * double-admission (same assumption HybridIndex's vacuum makes:
    * replays arrive within grace; here even the violation is benign). */
  def vacuum(spark: SparkSession, graphDir: String,
             graceMs: Long = 30L * 60 * 1000,
             nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    val f = fs(spark, graphDir)
    val vs = versionsOf(spark, graphDir)
    val committed = vs.map { v =>
      v -> spark.read.parquet(s"$graphDir/v=$v/info.parquet")
        .head.getAs[Long]("committed_ms")
    }.toMap
    val deletable = vs.dropRight(1).zip(vs.drop(1)).collect {
      case (v, next) if committed(next) + graceMs <= nowMs => v
    }
    val removed = deletable.map { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$graphDir/v=$v"), true)
      s"v=$v"
    }
    val staged = f.listStatus(new org.apache.hadoop.fs.Path(graphDir))
      .filter(s => s.getPath.getName.startsWith("_staging_") &&
        s.getModificationTime + graceMs <= nowMs)
      .map { s => f.delete(s.getPath, true); s.getPath.getName }
    removed ++ staged
  }

  /** Latest committed snapshot. */
  def graph(spark: SparkSession, graphDir: String): DataFrame = {
    val v = versionsOf(spark, graphDir).max
    spark.read.parquet(s"$graphDir/v=$v/graph.parquet")
  }

  def labels(spark: SparkSession, graphDir: String): DataFrame = {
    val v = versionsOf(spark, graphDir).max
    spark.read.parquet(s"$graphDir/v=$v/labels.parquet")
  }
}
