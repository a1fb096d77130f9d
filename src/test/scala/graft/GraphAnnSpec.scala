package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingLsh, GraphAnn}

/** [[GraphAnn]] — k-NN-graph beam search. Pins the search CONTRACT on a
  * hand fixture (the beam genuinely walks the graph), beam-quality
  * monotonicity in rounds, the LSH-seeding claim (entry-only search has
  * no gradient in this random space; seeded search recovers real
  * neighbors), and determinism. */
class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def base = queries.ExtQueries.intEmbeddingsFrom(
    sources.Tables.embeddings(spark, dir))

  private def sigs = EmbeddingLsh.bandSigs(
    base.select("vec_id", "iv"), EmbeddingLsh.planesFor(base.count()))

  private def corpusGraph = GraphAnn.knnGraph(base,
    EmbeddingLsh.candidatePairs(sigs), k = 4)

  private def queriesDf = base.where(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))

  private def lshSeeds = {
    val qsigs = sigs.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("band").as("qband"), col("sig").as("qsig"))
    sigs.join(broadcast(qsigs),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
  }

  private def noSeeds = Seq.empty[(Long, Long)].toDF("qid", "vec_id")

  test("hand fixture: the beam walks a chain to the far-end nearest neighbor") {
    // 1-D chain embeddings at positions 0..5: the kNN graph is the
    // chain; a query at position 5 entered at node 0 must walk it.
    def vec(p: Long): Array[Long] = Array(p * 1000000L, 1000000L)
    val b = (0L to 5L).map(i => (i, vec(i), vec(i).map(x => x * x).sum))
      .toDF("vec_id", "iv", "n2")
    val graph = (0L to 4L).flatMap(i => Seq((i, i + 1, 0.0), (i + 1, i, 0.0)))
      .toDF("u", "v", "cos")
    val q = Seq((99L, vec(5L), vec(5L).map(x => x * x).sum)).toDF("qid", "qiv", "qn2")
    def top1(rounds: Int): Long =
      GraphAnn.search(graph, b, q, noSeeds, entry = 0L, beam = 2, rounds = rounds)
        .where(col("rk") === 1).collect().head.getLong(2)
    assert(top1(rounds = 5) === 5L, "enough rounds must reach the true NN")
    assert(top1(rounds = 1) !== 5L, "one round cannot reach the chain's far end")
  }

  test("beam quality is monotone in rounds; LSH seeding carries the recall") {
    val g = corpusGraph.localCheckpoint()
    val qs = queriesDf.localCheckpoint()
    val seeds = lshSeeds.localCheckpoint()
    def hits(seeded: Boolean, rounds: Int): (Int, Map[Long, Double]) = {
      val out = GraphAnn.search(g, base, qs,
        if (seeded) seeds else noSeeds, entry = 0L, beam = 4, rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      val brute = SparkEntry.queries("qx2_cosine_topk")(spark, dir)
        .where(col("rk") === 1).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val byQ = out.groupBy(_._1)
      val h = brute.count { case (q, nn) => byQ.getOrElse(q, Array.empty[(Long, Long, Double)]).exists(_._2 == nn) }
      (h, byQ.map { case (q, vs) => q -> vs.map(_._3).max })
    }
    val (hEntry, _) = hits(seeded = false, rounds = 3)
    val (hSeed1, best1) = hits(seeded = true, rounds = 1)
    val (hSeed3, best3) = hits(seeded = true, rounds = 3)
    info(s"recall@top1-in-beam4: entry-only $hEntry/10, seeded r1 $hSeed1/10, seeded r3 $hSeed3/10")
    // entry-only has no gradient to follow in a random space; LSH
    // seeding is what makes graph refinement work here (on THIS
    // structureless corpus the graph adds little beyond the seeds —
    // the planted-cluster test below is where expansion earns recall)
    assert(hSeed3 > hEntry, "LSH seeding must beat the blind entry")
    assert(hSeed3 >= 3, s"seeded search should recover real top-1s, got $hSeed3/10")
    best3.foreach { case (q, c3) =>
      best1.get(q).foreach(c1 => assert(c3 >= c1, s"qid $q: round-3 beam worse than round-1"))
    }
  }

  test("planted clusters: graph expansion adds recall beyond the bare seeds") {
    // ProbeGen's 10-cluster embedding formula, micro-integerized
    // directly (center per (label, dim) + per-vector noise).
    def vec(id: Long): Array[Long] = {
      val label = id * 2654435761L % 97L % 10L
      Array.tabulate(64) { d =>
        val a = label * 131071L + d * 97L + 5L
        val c = (a * a % 2147483647L % 401L - 200L) * 1000L
        val nz = ((id * 1009L + d * 31L + 3L) * 2654435761L % 2147483647L % 161L - 80L) * 1000L
        c + nz
      }
    }
    val b = (0L until 500L).map(i => (i, vec(i), vec(i).map(x => x * x).sum))
      .toDF("vec_id", "iv", "n2").localCheckpoint()
    val s = EmbeddingLsh.bandSigs(b.select("vec_id", "iv"), EmbeddingLsh.planesFor(500L))
      .localCheckpoint()
    val g = GraphAnn.knnGraph(b, EmbeddingLsh.candidatePairs(s), k = 4).localCheckpoint()
    val qs = b.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))
    val qsigs = s.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("band").as("qband"), col("sig").as("qsig"))
    val seeds = s.join(broadcast(qsigs),
        col("band") === col("qband") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct().localCheckpoint()
    // brute truth
    val brute = qs.crossJoin(b.select(col("vec_id"), col("iv"), col("n2")))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr("long_dot(iv, qiv)"))
      .withColumn("cosine", expr(
        "CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE)))"))
      .groupBy("qid").agg(expr("topk_by(cosine, vec_id, 1)").as("tk"))
      .select(col("qid"), expr("element_at(tk, 1).id").as("nn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(rounds: Int): Int = {
      val byQ = GraphAnn.search(g, b, qs, seeds, 0L, beam = 4, rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      brute.count { case (q, nn) => byQ.getOrElse(q, Array.empty[(Long, Long)]).exists(_._2 == nn) }
    }
    val r1 = recall(1); val r3 = recall(3)
    info(s"planted-cluster recall@top1-in-beam4: r1 $r1/${brute.size}, r3 $r3/${brute.size}")
    assert(r3 >= r1, "expansion must never lose recall")
    assert(r3 >= (brute.size * 7) / 10, s"clustered space: expect high recall, got $r3/${brute.size}")
  }

  test("admit == full rebuild on the corpus split; untouched nodes keep their edges") {
    val base = this.base.localCheckpoint()
    val sigs = this.sigs.localCheckpoint()
    val deltaIds = base.where(pmod(col("vec_id"), lit(7L)) === 3L)
      .select(col("vec_id").as("id"))
    val baseOnly = base.where(pmod(col("vec_id"), lit(7L)) =!= 3L)
    val baseSigs = sigs.join(deltaIds.withColumnRenamed("id", "vec_id"),
      Seq("vec_id"), "left_anti")
    val oldGraph = GraphAnn.knnGraph(baseOnly,
      EmbeddingLsh.candidatePairs(baseSigs), k = 4).localCheckpoint()
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val admitted = edges(GraphAnn.admit(base, sigs, oldGraph, deltaIds, 4))
    val rebuilt = edges(GraphAnn.knnGraph(base, EmbeddingLsh.candidatePairs(sigs), 4))
    assert(admitted === rebuilt, "incremental admission must equal the full rebuild")
    // a delta that collides with nothing leaves the old graph untouched
    import spark.implicits._
    val ghost = Seq(999999L).toDF("id") // not in sigs -> no buckets -> no touched nodes
    assert(edges(GraphAnn.admit(base, sigs, oldGraph, ghost, 4)) === edges(oldGraph))
    // admission is IDEMPOTENT: re-delivering an already-admitted delta
    // recomputes the same touched nodes over the same union buckets —
    // the K6/K7 replay discipline falls out of admit being a pure
    // function of (sigs, delta), no WAL needed
    val once = GraphAnn.admit(base, sigs, oldGraph, deltaIds, 4).localCheckpoint()
    assert(edges(GraphAnn.admit(base, sigs, once, deltaIds, 4)) === edges(once))
  }

  test("cell-built graph: full coverage, intra-cell edges, search works on planted clusters") {
    // the qx113 construction on the planted fixture: every node with a
    // ≥2-member cell gets out-edges, every edge is intra-cell, and
    // cell-seeded search recovers the true neighbors
    def vec(id: Long): Array[Long] = {
      val label = id * 2654435761L % 97L % 10L
      Array.tabulate(64) { d =>
        val a = label * 131071L + d * 97L + 5L
        (a * a % 2147483647L % 401L - 200L) * 1000L +
          ((id * 1009L + d * 31L + 3L) * 2654435761L % 2147483647L % 161L - 80L) * 1000L
      }
    }
    val b = (0L until 500L).map(i => (i, vec(i), vec(i).map(x => x * x).sum))
      .toDF("vec_id", "iv", "n2").localCheckpoint()
    // use the true labels as "cells" — the spec isolates the graph
    // construction from k-means quality
    val asg = b.select(col("vec_id"),
      (col("vec_id") * 2654435761L % 97L % 10L).as("cid")).localCheckpoint()
    val g = GraphAnn.knnGraphFromCells(b, asg, k = 4).localCheckpoint()
    val cellOf = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = g.select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (u, v) => assert(cellOf(u) === cellOf(v), s"$u->$v crosses cells") }
    assert(edges.map(_._1).distinct.length === 500, "every node must carry out-edges")
    // cell-seeded search: brute truth within reach
    val qs = b.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))
    val seeds = qs.select(col("qid"))
      .join(asg.select(col("vec_id").as("qid"), col("cid")), "qid")
      .join(asg.select("vec_id", "cid"), "cid")
      .select("qid", "vec_id")
    val brute = qs.crossJoin(b.select(col("vec_id"), col("iv"), col("n2")))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr("long_dot(iv, qiv)"))
      .withColumn("cosine", expr(
        "CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE)))"))
      .groupBy("qid").agg(expr("topk_by(cosine, vec_id, 1)").as("tk"))
      .select(col("qid"), expr("element_at(tk, 1).id").as("nn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQ = GraphAnn.search(g, b, qs, seeds, 0L, beam = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val hits = brute.count { case (q, nn) =>
      byQ.getOrElse(q, Array.empty[(Long, Long)]).exists(_._2 == nn) }
    info(s"cell-graph recall@top1-in-beam4: $hits/${brute.size}")
    assert(hits === brute.size, "full-coverage cells must recover every true top-1 here")
  }

  test("the size-gated local beam equals the distributed rounds bit for bit") {
    // Round 17: search() takes a driver-local beam replay below the
    // measured-size gates; (qid, rk, vec_id, cosine) must be identical —
    // cosine INCLUDED, to the last double bit — to the distributed
    // rounds on the real sf0.001 corpus with LSH seeds.
    val g = corpusGraph
    val local = GraphAnn.search(g, base, queriesDf, lshSeeds, 0L, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val dist = GraphAnn.searchSeededDistributed(g, base, queriesDf,
        lshSeeds.select(col("qid"), col("vec_id"))
          .unionByName(queriesDf.select(col("qid")).withColumn("vec_id", lit(0L))),
        beam = 4, rounds = 3, selfExclude = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(local.nonEmpty && local.toSeq === dist.toSeq)
  }

  test("deterministic under repartitioning") {
    val g = corpusGraph
    val a = GraphAnn.search(g, base.repartition(7), queriesDf, lshSeeds, 0L, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val b = GraphAnn.search(g, base, queriesDf.repartition(3), lshSeeds, 0L, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(a.toSeq === b.toSeq)
  }
}
