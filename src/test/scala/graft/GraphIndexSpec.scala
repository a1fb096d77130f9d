package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphIndex, HybridIndex}
import graft.sources.Tables

/** [[GraphIndex]]'s round-14 bookkeeping seams (r13 verdict #3 + the
  * three advice items on the same file): the commit record now carries
  * the committed corpus size and the CUMULATIVE seg ledger, so the
  * per-batch admit decides its regime from ONE info read — this suite
  * pins that the recorded inputs equal the r13 spellings they replace
  * (n_base == base.count(), ledger == every admitted seg) on both a
  * drip and a bulk admission, that the ledger survives vacuum (a
  * beyond-grace replay no-ops outright now), that a commit racing a
  * DIFFERENT seg to an existing version number fails loudly instead
  * of silently dropping the delta, and that community refresh
  * cold-starts when the labels leg never committed. */
class GraphIndexSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def latestInfoRow(gDir: String): (Long, String, Long, Seq[String]) = {
    val vs = new java.io.File(gDir).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    val r = spark.read.parquet(s"$gDir/v=${vs.max}/info.parquet").head
    (vs.max, r.getAs[String]("seg"), r.getAs[Long]("n_base"),
      r.getAs[scala.collection.Seq[String]]("segs").toSeq)
  }

  /** Index over the first 60% of embedded docs + graph init; returns
    * (indexDir, graphDir, the admitted-id cut, all ids sorted). */
  private def fixture(tag: String): (String, String, Long, Array[Long]) = {
    val idx = tmpDir(s"gix_${tag}_idx"); val g = tmpDir(s"gix_${tag}_graph")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), idx)
    GraphIndex.init(spark, idx, g, expectedFinal = ids.length.toLong,
      k = 4, lpaIters = 4)
    (idx, g, cut, ids)
  }

  test("commit record carries n_base == committed count and the cumulative ledger, drip and bulk") {
    val (idx, g, cut, ids) = fixture("rec")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    // init's record
    val (v0, _, n0, l0) = latestInfoRow(g)
    assert(v0 === 0L && l0 === Seq("init"))
    assert(n0 === HybridIndex.committedBase(spark, idx).count(),
      "init must record the built corpus size")

    // DRIP: a handful of new ids through addBatch + admit
    val rest = ids.filter(_ >= cut)
    val (drip, bulk) = rest.splitAt(8)
    def admitWave(wave: Array[Long], seg: String): Unit = {
      val s = wave.toSet
      HybridIndex.addBatch(spark, idx,
        docs.where(col("doc_id").isin(s.toSeq: _*)),
        raw.where(col("vec_id").isin(s.toSeq: _*)), segKeyOpt = Some(seg))
      GraphIndex.admit(spark, idx, g,
        raw.where(col("vec_id").isin(s.toSeq: _*))
          .select(col("vec_id").as("id")), seg)
    }
    admitWave(drip, "b1")
    val (v1, _, n1, l1) = latestInfoRow(g)
    assert(v1 === 1L && l1 === Seq("init", "b1"))
    assert(n1 === HybridIndex.committedBase(spark, idx).count(),
      "drip admission must record exactly the committed corpus size " +
        "(the regime decision's n input unchanged from the base.count() spelling)")

    // BULK: the remaining ~40% in one wave (the rebuild regime at this
    // corpus — touched*4 >= n; the decision input is what we pin here)
    admitWave(bulk, "b2")
    val (v2, _, n2, l2) = latestInfoRow(g)
    // adjacent door keys COMPACT to one range token (round 15, r14
    // advice: commit-record size must be O(gaps), not O(admissions))
    assert(v2 === 2L && l2 === Seq("init", "b1-b2"))
    assert(Seq("init", "b1", "b2").forall(s =>
      graft.operators.GraphIndex.ledgerContains(l2, s)))
    assert(n2 === HybridIndex.committedBase(spark, idx).count(),
      "bulk admission must record exactly the committed corpus size")
    assert(n2 === ids.length.toLong)
    // the serve entry point rides the record too (round 14): min
    // committed vec_id, folded through init + admits — never a
    // per-serve base scan
    val entry = spark.read.parquet(s"$g/v=2/info.parquet")
      .head.getAs[Long]("entry_id")
    assert(entry === ids.min,
      "the recorded entry must be the min committed vec_id")

    // the ledger survives VACUUM: retire everything but the latest,
    // then replay both seg keys — no new version may appear (the
    // beyond-grace replay edge r13 documented as benign is now a
    // structural no-op)
    GraphIndex.vacuum(spark, g, graceMs = 0L)
    val before = latestInfoRow(g)._1
    GraphIndex.admit(spark, idx, g,
      raw.limit(1).select(col("vec_id").as("id")), "b1")
    GraphIndex.admit(spark, idx, g,
      raw.limit(1).select(col("vec_id").as("id")), "b2")
    assert(latestInfoRow(g)._1 === before,
      "replaying retired seg keys must no-op off the cumulative ledger")

    // an EMPTY delta admits nothing and commits nothing (the door's
    // empty-trigger contract; also the round-14 review's min-over-
    // zero-rows edge)
    GraphIndex.admit(spark, idx, g,
      raw.limit(0).select(col("vec_id").as("id")), "bEMPTY")
    assert(latestInfoRow(g)._1 === before,
      "an empty delta must not mint a version")
    assert(!GraphIndex.ledgerContains(latestInfoRow(g)._4, "bEMPTY"))

    // a beyond-grace replay under a NEW seg key (ids already in base)
    // must NOT inflate the folded n_base (round 15, r14 advice — the
    // dup anti-fold): the version mints, but n stays the true corpus
    // size, so the admit-vs-rebuild knee never drifts
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(drip.toSeq: _*))
        .select(col("vec_id").as("id")), "b9")
    val (_, _, nReplay, _) = latestInfoRow(g)
    assert(nReplay === HybridIndex.committedBase(spark, idx).count(),
      "replayed ids under a new seg key must fold as zero new vectors")
  }

  test("ledger compaction folds door-key runs; ledgerContains resolves ranges") {
    import GraphIndex.{ledgerAdd, ledgerContains}
    val l = Seq("b0", "b1", "b2", "b3", "b7", "init", "b5")
      .foldLeft(Seq.empty[String])(ledgerAdd)
    assert(l === Seq("init", "b0-b3", "b5", "b7"),
      "maximal runs compact; gaps and literals survive")
    assert((0 to 3).forall(i => ledgerContains(l, s"b$i")))
    assert(ledgerContains(l, "b5") && ledgerContains(l, "b7") &&
      ledgerContains(l, "init"))
    assert(!ledgerContains(l, "b4") && !ledgerContains(l, "b6") &&
      !ledgerContains(l, "b8") && !ledgerContains(l, "other"))
    // adding a key that bridges two ranges merges them
    assert(ledgerAdd(l, "b4") === Seq("init", "b0-b5", "b7"))
    // idempotent adds
    assert(ledgerAdd(l, "b2") === l && ledgerAdd(l, "init") === l)
  }

  test("non-canonical numeric-looking keys are literals: 'b01' never aliases 'b1'") {
    import GraphIndex.{ledgerAdd, ledgerContains}
    // r15 advice: numeric canonicalization would (a) skip b01's
    // admission as a b1 replay and (b) compact the literal away,
    // losing the string that names sigs/seg=b01
    val l = Seq("b1", "b2").foldLeft(Seq.empty[String])(ledgerAdd)
    assert(!ledgerContains(l, "b01"),
      "'b01' must not read as contained via the b1-b2 range")
    val l2 = ledgerAdd(l, "b01")
    assert(l2.contains("b01") && l2.contains("b1-b2"),
      "'b01' must survive as its own literal token, uncompacted")
    assert(ledgerContains(l2, "b01") && ledgerContains(l2, "b1"))
    // and a canonical key never matches the literal
    assert(!ledgerContains(Seq("b01"), "b1"))
  }

  test("overflow-length numeric keys degrade to literals (never throw) — agreeing with the TRY_CAST predicate") {
    import GraphIndex.{ledgerAdd, ledgerContains}
    // r16 advice: 'b' + 20 digits matches the DoorKey regex but
    // overflows toLong — an unguarded parse threw inside
    // ledgerContains/ledgerAdd while committedSegPredicate's TRY_CAST
    // mapped the same key to null; both spellings must treat it as a
    // plain literal
    val big = "b" + "9" * 20
    val l = Seq("b1", "b2").foldLeft(Seq.empty[String])(ledgerAdd)
    assert(!ledgerContains(l, big))
    val l2 = ledgerAdd(l, big)
    assert(l2.contains(big) && l2.contains("b1-b2"),
      "an overflow-length key must survive as its own literal token")
    assert(ledgerContains(l2, big) && ledgerContains(l2, "b1"))
    // and the SQL-side predicate agrees: the literal matches exactly,
    // without a numeric-cast crash under ANSI mode
    import spark.implicits._
    val kept = Seq(big, "b1", "b3").toDF("seg")
      .where(GraphIndex.committedSegPredicate(l2))
      .collect().map(_.getString(0)).toSet
    assert(kept === Set(big, "b1"))
  }

  test("generatorFor picks cells past the knee; init default resolves it") {
    assert(GraphIndex.generatorFor(GraphIndex.CellsKnee) === "cells")
    assert(GraphIndex.generatorFor(GraphIndex.CellsKnee - 1) === "lsh")
    // the sf-scale fixture sits below the knee: auto must have pinned
    // the lsh generator in meta (every default-init spec in this file
    // keeps replaying the LSH family unchanged)
    val (_, g, _, _) = fixture("autogen")
    assert(spark.read.parquet(s"$g/meta.parquet")
      .head.getAs[String]("generator") === "lsh")
  }

  test("committedSegPredicate admits exactly the ledger: ranges match canonical keys only, literals exact") {
    import spark.implicits._
    // the discriminating unit check (the e2e orphan test below can
    // land in the rebuild regime, whose base.count() masks the
    // predicate): every seg-partition spelling against a mixed ledger
    val segs = Seq("init", "b1", "b3", "b4", "b05", "b5", "x", "bORPHAN")
      .toDF("seg")
    val ledger = Seq("init", "b1-b3", "b05", "x")
    val kept = segs.where(GraphIndex.committedSegPredicate(ledger))
      .collect().map(_.getString(0)).toSet
    // b4/b5 are outside the range and not listed; 'b05' matches ONLY
    // its literal (never the b1-b3 range via numeric aliasing); the
    // orphan key is invisible to the dup scan
    assert(kept === Set("init", "b1", "b3", "b05", "x"))
  }

  test("a rebuild folds every on-disk sig segment into the ledger (orphans it built from become committed)") {
    import spark.implicits._
    val (idx, g, cut, ids) = fixture("rebfold")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val rest = ids.filter(_ >= cut)
    val (orphanWave, bulk) = rest.splitAt(6)
    // the orphan wave reaches the INDEX and its sig segment, but the
    // graph commit "crashed" — only the segment exists
    val os = orphanWave.toSet
    HybridIndex.addBatch(spark, idx,
      docs.where(col("doc_id").isin(os.toSeq: _*)),
      raw.where(col("vec_id").isin(os.toSeq: _*)), segKeyOpt = Some("b3"))
    orphanWave.map(id => (id, 0L, 7L)).toSeq.toDF("vec_id", "band", "sig")
      .write.parquet(s"$g/sigs/seg=b3")
    // a BULK wave rebuilds (touched*4 >= n at this corpus): the
    // rebuild reads ALL of sigs/ — the orphan included — and records
    // base.count(), so the orphan's ids ARE committed; the ledger must
    // say so (round 16 review: otherwise a cross-key re-delivery of
    // the orphan wave reads nDup = 0 against the committed-only scan
    // and OVERCOUNTS n_base)
    val bs = bulk.toSet
    HybridIndex.addBatch(spark, idx,
      docs.where(col("doc_id").isin(bs.toSeq: _*)),
      raw.where(col("vec_id").isin(bs.toSeq: _*)), segKeyOpt = Some("b4"))
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(bs.toSeq: _*))
        .select(col("vec_id").as("id")), "b4")
    val (v, _, n, ledger) = latestInfoRow(g)
    assert(GraphIndex.ledgerContains(ledger, "b3"),
      s"the rebuild must fold the orphan seg it built from, got $ledger")
    assert(n === HybridIndex.committedBase(spark, idx).count())
    // same-key re-delivery of the orphan wave now no-ops outright
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(os.toSeq: _*))
        .select(col("vec_id").as("id")), "b3")
    assert(latestInfoRow(g)._1 === v,
      "re-delivering the rebuild-folded orphan seg must not mint a version")
    // and a CROSS-KEY re-delivery folds as zero new vectors: the ids
    // sit in the now-committed b3 segment, so the dup scan counts them
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(os.toSeq: _*))
        .select(col("vec_id").as("id")), "b9")
    assert(latestInfoRow(g)._3 === HybridIndex.committedBase(spark, idx).count(),
      "cross-key re-delivery of a rebuild-committed wave must not inflate n_base")
  }

  test("a rebuild does not fold a TORN sig segment (no _SUCCESS) — same-key re-delivery still repairs it") {
    import spark.implicits._
    val (idx, g, cut, ids) = fixture("rebtorn")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val rest = ids.filter(_ >= cut)
    val (tornWave, bulk) = rest.splitAt(6)
    // a crash MID delta_sigs write: task-committed part files are on
    // disk but the job never committed — no _SUCCESS marker. Folding
    // this key into the rebuild's ledger would turn the documented
    // repair path (same-key re-delivery idempotently overwrites its
    // own segment) into a silent no-op, leaving any rows the torn
    // write lost out of the candidate generator permanently (round
    // 17, r16 advice).
    val ts = tornWave.toSet
    HybridIndex.addBatch(spark, idx,
      docs.where(col("doc_id").isin(ts.toSeq: _*)),
      raw.where(col("vec_id").isin(ts.toSeq: _*)), segKeyOpt = Some("b3"))
    tornWave.map(id => (id, 0L, 7L)).toSeq.toDF("vec_id", "band", "sig")
      .write.parquet(s"$g/sigs/seg=b3")
    assert(new java.io.File(s"$g/sigs/seg=b3/_SUCCESS").delete(),
      "fixture must be able to tear the segment's job-commit marker")
    val bs = bulk.toSet
    HybridIndex.addBatch(spark, idx,
      docs.where(col("doc_id").isin(bs.toSeq: _*)),
      raw.where(col("vec_id").isin(bs.toSeq: _*)), segKeyOpt = Some("b4"))
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(bs.toSeq: _*))
        .select(col("vec_id").as("id")), "b4")
    val (v, _, _, ledger) = latestInfoRow(g)
    assert(!GraphIndex.ledgerContains(ledger, "b3"),
      s"a torn (un-job-committed) segment must stay out of the rebuild's ledger fold, got $ledger")
    // same-key re-delivery is NOT a no-op: it re-admits, and its
    // idempotent segment overwrite repairs the torn write
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(ts.toSeq: _*))
        .select(col("vec_id").as("id")), "b3")
    val (v2, _, _, ledger2) = latestInfoRow(g)
    assert(v2 === v + 1L,
      "re-delivering a torn segment's wave must mint a repair version")
    assert(GraphIndex.ledgerContains(ledger2, "b3"))
    assert(new java.io.File(s"$g/sigs/seg=b3/_SUCCESS").exists(),
      "the repair admit must rewrite the segment to a job-committed state")
  }

  test("dup anti-fold reads only ledger-committed segments (a crashed admit's orphan seg never undercounts)") {
    import spark.implicits._
    val (idx, g, cut, ids) = fixture("orphan")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val wave = ids.filter(_ >= cut).take(6)
    // simulate a crash AFTER the sig write, BEFORE the version commit:
    // an orphan segment holding the wave's ids exists on disk but no
    // ledger records it (r15 advice: the dup scan must not count these
    // ids as already-admitted when the wave is re-delivered under a
    // DIFFERENT key)
    wave.map(id => (id, 0L, 0L)).toSeq.toDF("vec_id", "band", "sig")
      .write.parquet(s"$g/sigs/seg=bCRASHED")
    val s = wave.toSet
    HybridIndex.addBatch(spark, idx,
      docs.where(col("doc_id").isin(s.toSeq: _*)),
      raw.where(col("vec_id").isin(s.toSeq: _*)), segKeyOpt = Some("b7"))
    GraphIndex.admit(spark, idx, g,
      raw.where(col("vec_id").isin(s.toSeq: _*))
        .select(col("vec_id").as("id")), "b7")
    assert(latestInfoRow(g)._3 === HybridIndex.committedBase(spark, idx).count(),
      "genuinely new ids must fold as new despite the orphan segment")
  }

  test("a pre-r14 info schema fails with a descriptive re-init message") {
    import spark.implicits._
    val g = tmpDir("gix_oldschema")
    Seq(("init", 1L)).toDF("seg", "committed_ms")
      .write.parquet(s"$g/v=0/info.parquet")
    val ex = intercept[IllegalArgumentException] {
      GraphIndex.admit(spark, "/nonexistent", g,
        spark.range(1).select(lit(1L).as("id")), "b0")
    }
    assert(ex.getMessage.contains("pre-r14") &&
      ex.getMessage.contains("re-init"))
  }

  test("search selfExclude=false serves an external query whose id collides with a corpus vec_id") {
    val (idx, g, _, _) = fixture("selfx")
    val committed = HybridIndex.committedBase(spark, idx)
    // an "external" query that reuses a committed id AND its vector:
    // under the in-corpus convention that vector is excluded from its
    // own results; an external caller wants it back (cosine 1.0 top)
    val qs = committed.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2")).localCheckpoint()
    val qid = qs.head.getLong(0)
    val withSelf = GraphIndex.search(spark, idx, g, qs, selfExclude = false)
      .collect()
    assert(withSelf.exists(r => r.getLong(0) === qid && r.getLong(2) === qid),
      "selfExclude=false must let the colliding corpus vector surface")
    val without = GraphIndex.search(spark, idx, g, qs).collect()
    assert(!without.exists(r => r.getLong(2) === qid),
      "the default must keep the in-corpus exclusion")
  }

  test("cells generator: admission == pinned-books rebuild; asset serve == inline cells twin; refresh covers the corpus") {
    import graft.operators.{EmbeddingLsh, GraphAnn}
    val idx = tmpDir("gix_cells_idx"); val g = tmpDir("gix_cells_graph")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), idx)
    GraphIndex.init(spark, idx, g, expectedFinal = ids.length.toLong,
      k = 4, lpaIters = 4, generator = "cells")
    val rest = ids.filter(_ >= cut)
    val (w1, w2) = rest.splitAt(rest.length / 2)
    def wave(w: Array[Long], seg: String): Unit = {
      val s = w.toSet
      HybridIndex.addBatch(spark, idx,
        docs.where(col("doc_id").isin(s.toSeq: _*)),
        raw.where(col("vec_id").isin(s.toSeq: _*)), segKeyOpt = Some(seg))
      GraphIndex.admit(spark, idx, g,
        raw.where(col("vec_id").isin(s.toSeq: _*))
          .select(col("vec_id").as("id")), seg)
    }
    wave(w1, "b1"); wave(w2, "b2")
    val committed = HybridIndex.committedBase(spark, idx).localCheckpoint()
    val books = spark.read.parquet(s"$g/books.parquet")
    val splits = spark.read.parquet(s"$g/splits.parquet")
    val k2 = spark.read.parquet(s"$g/meta.parquet").head.getAs[Long]("cellk")
    // (1) the maintained graph equals a clean rebuild under the SAME
    // pinned codebooks — the qx110 admit==rebuild pin, cells flavor
    // (assignment depends only on (vector, books), so pinned books
    // make the incremental path's output provably rebuild-equal)
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rebuilt = GraphAnn.knnGraph(committed,
      EmbeddingLsh.candidatePairs(
        GraphAnn.cellSigs(committed, books, k2, splits)), 4)
    assert(edges(GraphIndex.graph(spark, g)) === edges(rebuilt),
      "cells-mode incremental admission must be bit-equal to the pinned-books rebuild")
    // n_base still folds exactly through cells-mode admissions
    assert(latestInfoRow(g)._3 === committed.count())
    // (2) the asset serve is bit-equal to the inline cells twin over
    // the same committed corpus (the IndexDoorSpec discipline)
    val qs = committed.where(pmod(col("vec_id"), lit(50L)) === 0L)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2")).localCheckpoint()
    def beamSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(beamSet(GraphIndex.search(spark, idx, g, qs)) ===
      beamSet(GraphAnn.inlineServeCells(committed, books, k2, splits, qs,
        k = 4, beam = 4, rounds = 3)),
      "asset serve must equal the inline cells spelling")
    // (3) the community refresh runs over the cell candidate graph
    // and covers the committed corpus
    GraphIndex.refreshCommunities(spark, idx, g)
    assert(GraphIndex.labels(spark, g).select("u").collect()
      .map(_.getLong(0)).toSet ===
      committed.select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("a commit racing a different seg to an existing version fails loudly; identical re-commit no-ops") {
    val (_, g, _, _) = fixture("race")
    import spark.implicits._
    val probe = Seq((1L, 2L, 0.5)).toDF("u", "v", "cos")
    // identical seg (re-delivered commit losing the exists race): silent
    GraphIndex.commitVersion(spark, g, "v=0", "init", "graph", probe)
    // different seg to the same version: the r13-advice failure mode —
    // two writers racing distinct deltas; the loser must throw, not
    // silently vanish from the graph
    val ex = intercept[java.io.IOException] {
      GraphIndex.commitVersion(spark, g, "v=0", "bOTHER", "graph", probe)
    }
    assert(ex.getMessage.contains("bOTHER") && ex.getMessage.contains("init"))
  }

  test("refreshCommunities cold-starts when no labeling ever committed; before init it refuses") {
    val (idx, g, _, _) = fixture("cold")
    // simulate the init crash between the v=0 commit and labels_v=0:
    // delete the labels version outright
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr)
      f.delete()
    }
    rmr(new java.io.File(s"$g/labels_v=0"))
    GraphIndex.refreshCommunities(spark, idx, g)
    val labels = GraphIndex.labels(spark, g)
    val committed = HybridIndex.committedBase(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(labels.select("u").collect().map(_.getLong(0)).toSet === committed,
      "cold-start labeling must cover the committed corpus")

    // before init: a bare empty dir must refuse, not empty.max-crash
    val fresh = tmpDir("gix_noinit")
    val exR = intercept[IllegalArgumentException] {
      GraphIndex.refreshCommunities(spark, idx, fresh)
    }
    assert(exR.getMessage.contains("before init"))
    val exA = intercept[IllegalArgumentException] {
      GraphIndex.admit(spark, idx, fresh,
        spark.range(1).select(lit(1L).as("id")), "b0")
    }
    assert(exA.getMessage.contains("before init"))
  }
}
