package graft

import graft.operators.HybridIndex

/** [[HybridIndex]]: the persisted build/serve split must reproduce the
  * monolithic qx79b gate BIT-identically — same trained books, same
  * codes, same BM25 integers, same fused ranks — after a full parquet
  * round-trip of every asset. Transitively this pins the served output
  * against the DuckDB oracle (qx79b is hash-green). */
class HybridIndexSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("build + search from parquet assets == monolithic qx79b") {
    val out = tmpDir("hybrid_idx")
    HybridIndex.build(spark, dir, out)
    // The probed-cell predicate must prune the hive-bucketed codes at
    // the FILE INDEX (partitionFilters), never as a post-scan filter.
    val codeScans = HybridIndex.search(spark, out)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("codes.parquet")) => f
      }
    assert(codeScans.nonEmpty && codeScans.forall(_.partitionFilters.nonEmpty),
      "the probed-cell bucket predicate must land in partitionFilters")
    val served = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val gate = SparkEntry.queries("qx79b_hybrid_ivfadc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(served.size == gate.size && served == gate,
      s"served output diverged from the monolithic gate: " +
        s"served=${served.size} gate=${gate.size}, " +
        s"diff=${(served.toSet -- gate.toSet).take(3)}")
  }

  test("searchGraphFused from a maintained graph asset == monolithic qx79c") {
    val out = tmpDir("hybrid_gidx"); val g = tmpDir("hybrid_gidx_graph")
    HybridIndex.build(spark, dir, out)
    // graph asset over the committed corpus, LSH generator sized from
    // the corpus itself — the exact regime qx79c's inline build uses,
    // so the persisted serve must be BIT-equal to the gate row (the
    // qx79b pin, graph-dense flavor; transitively oracle-pinned)
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    graft.operators.GraphIndex.init(spark, out, g, expectedFinal = n)
    def fused(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val served = fused(HybridIndex.searchGraphFused(spark, out, g))
    val gate = fused(SparkEntry.queries("qx79c_hybrid_graph")(spark, dir))
    assert(served.size == gate.size && served == gate,
      s"graph-fused serve diverged from the qx79c gate: " +
        s"served=${served.size} gate=${gate.size}, " +
        s"diff=${(served.toSet -- gate.toSet).take(3)}")
  }

  test("addBatch equals a frozen-codebook rebuild over the union corpus") {
    import org.apache.spark.sql.functions.col
    import graft.queries.ExtQueries
    import graft.operators.{ProductQuantizer, QuantKernels}
    import graft.sources.Tables
    val out = tmpDir("hybrid_inc")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), out)
    HybridIndex.addBatch(spark, out, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    val served = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    // Reference: the SAME frozen books (trained on the A slice), the
    // union corpus encoded against them, qx79b's serve + lexical legs.
    val books = spark.read.parquet(s"$out/imi_books.parquet")
    val pqBooks = spark.read.parquet(s"$out/pq_books.parquet")
    val k = spark.read.parquet(s"$out/meta.parquet").head.getLong(0)
    val baseAB = ExtQueries.intEmbeddingsFrom(raw)
    val resAB = QuantKernels.encodeResidual(baseAB.select("vec_id", "iv"), books, k)
    val codesAB = ProductQuantizer.packed(resAB.select("vec_id", "iv"), pqBooks)
      .join(resAB.select("vec_id", "cell"), "vec_id")
    val q = baseAB.where(col("vec_id") % 50 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))
    val dense = ExtQueries.ivfadcServe(q, books, pqBooks, codesAB, baseAB, k, 20)
      .select(col("qid"), col("vec_id").as("doc_id"),
        col("rk").cast("long").as("dense_rk"))
    val expect = ExtQueries.rrfFuse(dense, ExtQueries.bm25Top20(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(served == expect,
      s"incremental index diverged from the frozen-codebook rebuild: " +
        s"diff=${(served.toSet -- expect.toSet).take(3)}")
    // the increment genuinely contributed: some fused results come
    // from the B slice
    assert(served.values.exists(_._1 >= cut),
      "fixture must surface B-slice docs in the fused top-10")

    // IDEMPOTENT RETRY (the r10 review's top finding): re-delivering
    // the SAME batch overwrites its own segment instead of
    // double-counting — search output must be byte-identical after.
    HybridIndex.addBatch(spark, out, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    val again = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(again == expect, "a re-delivered addBatch changed the index")

    // COMPACT (the Lucene merge under the manifest commit) + VACUUM:
    // search is unchanged, and each asset folds to ONE live segment
    // with the superseded dirs collected (grace 0: the test KNOWS the
    // superseded dirs are dead; production uses the retention default).
    HybridIndex.compact(spark, out)
    HybridIndex.vacuum(spark, out, graceMs = 0L)
    val compacted = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(compacted == expect, "compaction changed the served output")
    val segDirs = new java.io.File(s"$out/base.parquet").listFiles()
      .filter(_.getName.startsWith("add=")).map(_.getName).toSeq
    assert(segDirs.length == 1 && segDirs.head.startsWith("add=compact_"),
      s"vacuum must leave exactly the compacted segment, got $segDirs")
  }

  /** The round-11 commit-protocol hardening (r10 advice #1–#3): the
    * manifest is VERSIONED (`manifest/v=N`, readers resolve max N), so
    * commits never open a manifest-less window; vacuum's grace period
    * protects an in-flight writer's uncommitted segment; and the
    * compact key is a content digest, not a 32-bit hashCode. */
  test("versioned manifest: commits retain old versions; vacuum grace shields in-flight segments") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    val out = tmpDir("hybrid_proto")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), out)

    def manifestVersions(): Seq[Long] =
      new java.io.File(s"$out/manifest").listFiles()
        .map(_.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong).toSeq.sorted
    assert(manifestVersions() == Seq(1L), "build commits manifest v=1")

    // Simulate an IN-FLIGHT addBatch that has written its segment dirs
    // but not yet committed: a fresh orphan add= dir. A default-grace
    // vacuum must NOT sweep it (it is younger than the grace period) —
    // the r10 advice's lost-segment race is exactly this window.
    val orphan = new java.io.File(s"$out/base.parquet/add=99999_99999")
    assert(orphan.mkdirs())
    HybridIndex.vacuum(spark, out) // default grace
    assert(orphan.exists(),
      "vacuum swept a fresh uncommitted segment inside the grace period")

    // A real commit on top: the OLD manifest version must remain
    // readable (a reader that resolved v=1 mid-commit keeps its view;
    // there is no delete-then-rename gap).
    HybridIndex.addBatch(spark, out, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    assert(manifestVersions() == Seq(1L, 2L),
      "addBatch must commit v=2 and retain v=1")
    val v1 = spark.read.parquet(s"$out/manifest/v=1")
      .collect().map(_.getString(0)).toSeq
    assert(v1 == Seq("build"), s"superseded manifest v=1 must stay readable, got $v1")
    val afterAdd = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // Grace-0 vacuum: the known-dead orphan AND the superseded
    // manifest version go; the current version and live segments stay;
    // the served output is byte-identical across the interleaving.
    HybridIndex.vacuum(spark, out, graceMs = 0L)
    assert(!orphan.exists(), "grace-0 vacuum must collect the dead orphan")
    assert(manifestVersions() == Seq(2L),
      "grace-0 vacuum must drop superseded manifest versions, keep current")
    val afterVacuum = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(afterVacuum.nonEmpty && afterVacuum == afterAdd,
      "vacuum must not change the served output")
  }

  /** Round-12 protocol hardening (r11 advice #1–#3): vacuum retention
    * is keyed to each manifest version's RECORDED supersede time (the
    * next version's committed_ms), never to filesystem mtime — a
    * clock-skew/compact-exposure simulation proves a just-superseded
    * segment with an arbitrarily OLD mtime survives the default grace;
    * crashed commits' `_staging_*` dirs are collected by stage-time
    * grace; and a rename onto a pre-existing `v=N` is detected as a
    * lost race up front (RawLocalFileSystem "succeeds" such renames by
    * nesting the source inside the destination). */
  test("supersede-time retention, staging garbage, and the v=N squatter race") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    val out = tmpDir("hybrid_skew")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val (cut1, cut2) = (ids(ids.length * 3 / 5), ids(ids.length * 4 / 5))
    HybridIndex.build(spark, docs.where(col("doc_id") < cut1),
      raw.where(col("vec_id") < cut1), out)
    HybridIndex.addBatch(spark, out,
      docs.where(col("doc_id") >= cut1 && col("doc_id") < cut2),
      raw.where(col("vec_id") >= cut1 && col("vec_id") < cut2))
    HybridIndex.compact(spark, out) // v=3 supersedes build + batch segs NOW

    // CLOCK SKEW / compact exposure: age EVERY add= dir and manifest
    // version's mtime to the epoch. The old mtime-keyed rule would
    // sweep all superseded paths despite the supersede having happened
    // milliseconds ago; supersede-time retention must keep every one.
    def allDirs(): Seq[java.io.File] =
      (Seq("base.parquet", "codes.parquet", "tf.parquet", "df_parts.parquet",
        "stats_parts.parquet", "folded.parquet").flatMap { a =>
        Option(new java.io.File(s"$out/$a").listFiles()).toSeq.flatten
          .filter(_.getName.startsWith("add="))
      }) ++ Option(new java.io.File(s"$out/manifest").listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("v="))
    val aged = allDirs()
    aged.foreach(f => assert(f.setLastModified(1000L)))
    HybridIndex.vacuum(spark, out) // default grace
    assert(aged.forall(_.exists()),
      "a just-superseded path was deleted on dir mtime despite the " +
        "supersede time being within the grace window")
    // A reader pinned at the pre-compact manifest still reads its view.
    val v2 = spark.read.parquet(s"$out/manifest/v=2")
      .select("seg").collect().map(_.getString(0)).toSeq.sorted
    assert(v2.size == 2 && v2.contains("build"),
      s"pre-compact manifest v=2 must stay readable in-grace, got $v2")

    // Crashed-commit staging garbage (stage-time grace): an old
    // `_staging_*` dir is collected, a fresh one (a possibly in-flight
    // commit) is kept.
    val deadStage = new java.io.File(s"$out/manifest/_staging_v99")
    val liveStage = new java.io.File(s"$out/manifest/_staging_v100")
    assert(deadStage.mkdirs() && liveStage.mkdirs())
    assert(deadStage.setLastModified(1000L))
    HybridIndex.vacuum(spark, out) // default grace
    assert(!deadStage.exists(), "aged crash-orphaned staging dir must be collected")
    assert(liveStage.exists(), "fresh staging dir must survive the grace")
    liveStage.delete()

    // v=N SQUATTER: another writer's v=4 lands between this writer's
    // version resolution and its rename (reproduced via the
    // version-pinned commit — the public entry points re-resolve the
    // version too early to interleave). The commit must fail loudly
    // with the index unchanged, NOT nest the staging dir inside the
    // squatter and report success (what a raw rename does on
    // RawLocalFileSystem).
    val squatter = new java.io.File(s"$out/manifest/v=4")
    assert(squatter.mkdirs())
    val compactSeg = spark.read.parquet(s"$out/manifest/v=3").select("seg")
      .collect().map(_.getString(0)).toSeq
    val ex = intercept[java.io.IOException](
      HybridIndex.commitManifestAt(spark, out, compactSeg :+ "race_seg", 4L))
    assert(ex.getMessage.contains("lost the rename race"), ex.getMessage)
    assert(squatter.listFiles() == null || squatter.listFiles().isEmpty,
      "the failed commit must not have nested anything inside the squatter")
    assert(!new java.io.File(s"$out/manifest/_staging_v4").exists(),
      "the failed commit must clean up its staging dir")
    assert(compactSeg.size == 1 && compactSeg.head.startsWith("compact_"),
      "a lost race must leave the committed state untouched")

    // Recovery: clear the squatter and deliver a real batch — the
    // commit lands as v=4.
    assert(squatter.delete())
    HybridIndex.addBatch(spark, out,
      docs.where(col("doc_id") >= cut2), raw.where(col("vec_id") >= cut2))
    val liveNow = spark.read.parquet(s"$out/manifest/v=4").select("seg")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(liveNow.size == 2 && liveNow.exists(_.startsWith("compact_")),
      s"re-delivered batch must commit v=4 over the compacted base, got $liveNow")

    // Grace 0: the superseded (and aged) history goes, the live set stays.
    HybridIndex.vacuum(spark, out, graceMs = 0L)
    val versions = new java.io.File(s"$out/manifest").listFiles()
      .map(_.getName).filter(_.startsWith("v=")).toSeq
    assert(versions == Seq("v=4"), s"grace-0 vacuum must keep only current, got $versions")
    val baseSegs = new java.io.File(s"$out/base.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("add=")).toSeq.sorted
    assert(baseSegs == liveNow.map("add=" + _).sorted,
      s"grace-0 vacuum must keep exactly the live segments, got $baseSegs")
    assert(HybridIndex.search(spark, out).collect().nonEmpty,
      "the index must serve after the full interleaving")
  }

  test("time travel: searchAsOf pins a version snapshot across later commits") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    val out = tmpDir("hybrid_asof")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), out)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val snapshotV1 = canon(HybridIndex.search(spark, out))
    assert(snapshotV1.nonEmpty, "the v=1 snapshot must serve rows")
    assert(HybridIndex.versions(spark, out) == Seq(1L))

    // A later admission bumps the manifest — the v=1 reader's world
    // must not move.
    HybridIndex.addBatch(spark, out, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    assert(HybridIndex.versions(spark, out) == Seq(1L, 2L))
    assert(canon(HybridIndex.searchAsOf(spark, out, 1L)) == snapshotV1,
      "searchAsOf(1) must reproduce the pre-admission snapshot byte-for-byte")
    assert(canon(HybridIndex.searchAsOf(spark, out, 2L)) ==
      canon(HybridIndex.search(spark, out)),
      "searchAsOf(current) must equal the live search")
    // Never-committed and vacuum-retired versions fail loudly.
    intercept[IllegalArgumentException] {
      HybridIndex.searchAsOf(spark, out, 3L)
    }
    HybridIndex.vacuum(spark, out, graceMs = 0L)
    intercept[IllegalArgumentException] {
      HybridIndex.searchAsOf(spark, out, 1L)
    }
    assert(canon(HybridIndex.searchAsOf(spark, out, 2L)) ==
      canon(HybridIndex.search(spark, out)),
      "the current version must survive the vacuum that retired v=1")
  }

  test("searchDiverse: λ=1 reproduces served order; λ<1 stays in-pool with step 1 = rank 1") {
    val out = tmpDir("hybrid_mmr")
    HybridIndex.build(spark, dir, out)
    val served = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap // (qid, rk) -> doc
    val pool = served.groupBy(_._1._1).map { case (q, m) => q -> m.values.toSet }

    // λ = 1 kills the redundancy term: the greedy must walk the served
    // ranking exactly (same (score DESC, id ASC) order on both sides).
    val lam1 = HybridIndex.searchDiverse(spark, out, k = 5, lambda = 1.0).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(lam1.nonEmpty)
    lam1.foreach { case ((q, step), doc) =>
      assert(doc == served((q, step.toLong)),
        s"λ=1 step $step of qid $q diverged from served rank $step")
    }

    // λ = 0.7: every pick comes from the served pool, k distinct picks
    // per query, and step 1 is always the served top-1.
    val div = HybridIndex.searchDiverse(spark, out, k = 5, lambda = 0.7).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = div.groupBy(_._1)
    assert(byQ.keySet == pool.keySet, "diversified serve must cover every query")
    byQ.foreach { case (q, rows) =>
      val docs = rows.sortBy(_._2).map(_._3)
      assert(docs.length == 5 && docs.distinct.length == 5,
        s"qid $q must get 5 distinct picks")
      assert(docs.toSet.subsetOf(pool(q)), s"qid $q picked outside its served pool")
      assert(docs.head == served((q, 1L)), s"qid $q step 1 must be served rank 1")
    }
    val reordered = byQ.count { case (q, rows) =>
      val docs = rows.sortBy(_._2).map(_._3).toSeq
      docs != (1L to 5L).map(rk => served((q, rk)))
    }
    info(s"λ=0.7 reordered ${reordered}/${byQ.size} queries vs the served ranking")
  }

  test("searchLateInteraction: pool-restricted MaxSim; OPQ build serves identically") {
    import org.apache.spark.sql.functions._
    import graft.queries.ExtQueries
    import graft.sources.Tables
    val outN = tmpDir("li_nat"); val outO = tmpDir("li_opq")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    HybridIndex.build(spark, docs, raw, outN)
    HybridIndex.build(spark, docs, raw, outO, opq = true)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("rk").cast("long"), col("doc_id"), col("maxsim"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    // Reference builder: a build's OWN fused pool rescored by max_sim
    // over the RAW corpus vectors (independent of index storage). The
    // pools legitimately differ between natural and OPQ builds — PQ
    // quantization in the permuted space retrieves different dense
    // candidates — so the pin is per-build: serve == raw-vector
    // reference. For the OPQ build that equality holds ONLY if the
    // epilogue inverts the stored layout before token slicing (MaxSim's
    // token structure is positional; a permuted split scores
    // differently), which is exactly the property under test.
    val base = ExtQueries.intEmbeddingsFrom(raw)
    def reference(out: String) = {
      val pool = HybridIndex.search(spark, out)
        .select(col("qid"), col("doc_id").as("vec_id"))
      pool
        .join(base.select(col("vec_id"), col("iv")), "vec_id")
        .join(base.select(col("vec_id").as("qid"), col("iv").as("qiv")), "qid")
        .withColumn("maxsim", expr("max_sim(qiv, iv, 4)"))
        .groupBy("qid").agg(expr("topk_by(maxsim, vec_id, 5)").as("tk"))
        .select(col("qid"), posexplode(col("tk")).as(Seq("p", "t")))
        .select(col("qid"), (col("p") + 1).as("rk"),
          col("t.id").as("doc_id"), col("t.score").as("maxsim"))
    }
    val nat = canon(HybridIndex.searchLateInteraction(spark, outN))
    assert(nat.nonEmpty)
    assert(nat.toSeq === canon(reference(outN)).toSeq,
      "natural-build serve must equal the pool-restricted raw-vector MaxSim")
    val opq = canon(HybridIndex.searchLateInteraction(spark, outO))
    assert(opq.toSeq === canon(reference(outO)).toSeq,
      "OPQ-build serve must invert the layout before token slicing")
  }
}
