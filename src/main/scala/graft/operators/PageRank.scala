package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al. 1999) in EXACT integer arithmetic —
  * the domain-authority prior a web-scale corpus build uses as a quality
  * signal (the Common Crawl ranking discipline: rank the DOMAIN graph,
  * then let a page inherit its domain's authority).
  *
  * Everything is integer micro-units so the fixpoint is bit-reproducible
  * and a SQL oracle can replay it: ranks start at `scale` per node; one
  * iteration is
  *
  *   r'(v) = (15·scale)/100 + (85·(Σ_{u→v} r(u) div od(u) + dang div n)) div 100
  *
  * with `div` = floor division on non-negative longs (order-independent
  * sums, no float drift), `dang` = total rank of dangling nodes
  * (out-degree 0) redistributed uniformly — the standard stochastic-
  * matrix patch, here load-bearing because the caller can plant dangling
  * nodes. Floor losses mean total mass shrinks by < n per iteration
  * (bounded, deterministic) instead of renormalizing with floats.
  *
  * Plan shape per iteration: contributions = ranks ⋈ degrees ⋈ edges
  * (one hash join run, partial-summed map-side into groupBy(v)); the
  * dangling mass is ONE scalar row cross-joined in (broadcast NLJ);
  * node count is computed ONCE before the loop (a single bounded
  * collect, the IvfAnn Lloyd precedent). Nothing driver-side grows with
  * the graph: at 100 TB the domain graph is millions of nodes and each
  * iteration is two edge-list-sized shuffles, the qx20 class.
  *
  * Each round ends in `localCheckpoint`: the update reads the previous
  * ranks TWICE (contributions + dangling mass), so composing plans
  * doubles the logical tree per iteration — 2^T analysis cost by round
  * T (measured: 5.9 s → sub-second at the gate's 8 rounds). Truncating
  * lineage each round is also what bounds recovery cost for genuinely
  * iterative jobs at cluster scale (the GraphX/Pregel discipline; on a
  * cluster prefer reliable `checkpoint` to survive executor loss).
  */
object PageRank {

  /** @param nodes one column `u` (distinct node ids)
    * @param edges columns `u` (src), `v` (dst), distinct pairs
    * @param init  optional WARM-START ranks (`u`, `r`) — the
    *              incremental-crawl path: when the frontier grows the
    *              graph by a delta, restarting from the previous
    *              fixpoint reaches the new one in a fraction of the
    *              rounds (PageRankSpec measures it). New nodes absent
    *              from `init` enter at `scale`.
    * @return columns `u`, `r` (final rank in `scale`-units) */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
          scale: Long = 1000000L, init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(scale % 100L == 0L, "scale must be a multiple of 100 (exact teleport term)")
    // Size gate for the driver-local replay (round 17, guide §1.2): every
    // power iteration costs two joins, a scalar cross-join and a lineage
    // cut — per-round JOB latency that dominates when the graph is
    // metadata-sized (a domain graph is bounded by the eTLD+1 space, not
    // the corpus). Below the gate both tables are collected once (bounded
    // probes — at most max+1 rows read, never a full count of an unsized
    // frame) and the identical floor-division integer update replays on
    // the driver, bit-equal by the same argument the oracle replay rests
    // on. Past the gate the edge-shuffle rounds run unchanged — the
    // 100 TB path for corpus-sized graphs.
    val spark = nodes.sparkSession
    val maxEdges =
      spark.conf.get(LocalMaxEdgesConf, LocalMaxEdgesDefault.toString).toLong
    val maxNodes =
      spark.conf.get(LocalMaxNodesConf, LocalMaxNodesDefault.toString).toLong
    if (maxEdges > 0 && maxNodes > 0 &&
        maxEdges <= Int.MaxValue - 1 && maxNodes <= Int.MaxValue - 1) {
      val eArr = edges.select(col("u"), col("v"))
        .limit(maxEdges.toInt + 1).collect()
      if (eArr.length <= maxEdges) {
        val nArr = nodes.select(col("u")).limit(maxNodes.toInt + 1).collect()
        if (nArr.length <= maxNodes) {
          // The warm-start frame is caller-supplied — probe it with the
          // same bounded limit as the node table instead of collecting
          // it ungated inside the replay (r17 verdict; an over-limit
          // init sends the whole run to the distributed rounds).
          val initArr = init.map(_.select(col("u"), col("r"))
            .limit(maxNodes.toInt + 1).collect())
          if (initArr.forall(_.length <= maxNodes))
            return localRun(spark, nArr.map(_.getLong(0)),
              eArr.map(r => (r.getLong(0), r.getLong(1))), iters, scale,
              initArr.map(_.map(r => (r.getLong(0), r.getLong(1)))))
        }
      }
    }
    runDistributed(nodes, edges, iters, scale, init)
  }

  val LocalMaxEdgesConf = "spark.graft.pr.localMaxEdges"
  val LocalMaxEdgesDefault = 1000000L
  val LocalMaxNodesConf = "spark.graft.pr.localMaxNodes"
  val LocalMaxNodesDefault = 1000000L

  /** Driver-local replay of the EXACT distributed update — floor
    * division on non-negative longs everywhere, contributions only from
    * ranked sources, dangling mass from ranked nodes with no out-edge,
    * teleport term identical — so the fixpoint is bit-identical. */
  private def localRun(spark: org.apache.spark.sql.SparkSession,
                       nodeArr: Array[Long], edgeArr: Array[(Long, Long)],
                       iters: Int, scale: Long,
                       init: Option[Array[(Long, Long)]]): DataFrame = {
    val od = new java.util.HashMap[Long, Long](edgeArr.length * 2)
    edgeArr.foreach { case (u, _) => od.merge(u, 1L, (a, b) => a + b) }
    var ranks = new java.util.HashMap[Long, Long](nodeArr.length * 2)
    init match {
      case None => nodeArr.foreach(u => ranks.put(u, scale))
      case Some(prev) =>
        val p = new java.util.HashMap[Long, Long]()
        prev.foreach { case (u, r) => p.put(u, r) }
        nodeArr.foreach(u => ranks.put(u, p.getOrDefault(u, scale)))
    }
    val n = nodeArr.length.toLong
    val teleport = 15L * scale / 100L
    for (_ <- 1 to iters) {
      val inc = new java.util.HashMap[Long, Long](nodeArr.length * 2)
      edgeArr.foreach { case (u, v) =>
        if (ranks.containsKey(u)) inc.merge(v, ranks.get(u) / od.get(u), (a, b) => a + b)
      }
      var dang = 0L
      ranks.forEach((u, r) => if (!od.containsKey(u)) dang += r)
      val next = new java.util.HashMap[Long, Long](nodeArr.length * 2)
      val dshare = dang / n
      nodeArr.foreach { u =>
        next.put(u, teleport + (85L * (inc.getOrDefault(u, 0L) + dshare)) / 100L)
      }
      ranks = next
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodeArr.length)
    nodeArr.sorted.foreach(u => out.add(org.apache.spark.sql.Row(u, ranks.get(u))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(out, schema)
  }

  /** The edge-shuffle power iterations — the 100 TB path (and the
    * spec's equivalence anchor for the local replay). */
  def runDistributed(nodes: DataFrame, edges: DataFrame, iters: Int,
                     scale: Long = 1000000L, init: Option[DataFrame] = None): DataFrame = {
    // The graph is REUSED every round; without caching, a derived edge
    // list re-runs its full upstream (the 100×-probe finding: 500k-doc
    // scans × 17 = 12.7 s; cached, the loop touches only graph-sized
    // data). Caching the derived domain graph is exactly right at
    // 100 TB too — it is orders of magnitude smaller than the corpus.
    val nodesC = nodes.cache()
    val edgesC = edges.cache()
    val deg = edgesC.groupBy("u").agg(count(lit(1)).as("od")).cache()
    val n = nodesC.count() // bounded: one scalar, once, before the loop
    var ranks = init match {
      case None => nodesC.select(col("u"), lit(scale).as("r"))
      case Some(prev) => nodesC
        .join(prev.select(col("u"), col("r").as("r0")), Seq("u"), "left")
        .select(col("u"), coalesce(col("r0"), lit(scale)).as("r"))
    }
    for (it <- 1 to iters) {
      val contrib = ranks.join(deg, "u").join(edgesC, "u")
        .select(col("v"), expr("r div od").as("c"))
        .groupBy("v").agg(sum("c").as("inc"))
      val dang = ranks.join(deg, Seq("u"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dg"))
      ranks = nodesC
        .join(contrib.withColumnRenamed("v", "u"), Seq("u"), "left")
        .crossJoin(dang)
        .select(col("u"),
          (lit(15L * scale / 100L) +
            expr(s"(85 * (coalesce(inc, CAST(0 AS BIGINT)) + dg div $n)) div 100")).as("r"))
      // Cut the doubled-per-round lineage (see scaladoc). Measured at
      // the gate: eager per-round 3.8 s, every-2-rounds 4.0 s, lazy
      // 4.6 s — the remaining cost is per-round stage scheduling, the
      // honest price of a genuinely iterative fixpoint.
      ranks = ranks.localCheckpoint()
    }
    // final ranks are materialized by the eager checkpoint, so the
    // graph caches can be dropped before returning
    nodesC.unpersist(false); edgesC.unpersist(false); deg.unpersist(false)
    ranks
  }
}
