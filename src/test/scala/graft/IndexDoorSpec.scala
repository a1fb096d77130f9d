package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions.col

import graft.operators.HybridIndex
import graft.sources.{FileBus, Tables}
import graft.streaming.IndexDoor

/** [[IndexDoor]]: the live FileBus → [[HybridIndex.addBatch]] admission
  * leg must be EXACTLY-ONCE and bit-equal to batch maintenance — the
  * composed rendering of FileBusSpec's replay guarantees and
  * HybridIndexSpec's idempotent-addBatch pin. The door streams a
  * corpus split in waves with a kill/restart between them and bounded
  * triggers inside them; the reference is a one-shot batch addBatch of
  * the same slice (itself re-delivered once to pin the b<batchId>
  * segment-key discipline). Equality is on the full served output. */
class IndexDoorSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  private def served(out: String): Map[(Long, Long), (Long, Long, Long, Long)] =
    HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("streamed admission == one-shot batch admission, exactly-once across kill/restart") {
    val refOut = tmpDir("idxdoor_ref")
    val liveOut = tmpDir("idxdoor_live")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    val liveOut2 = tmpDir("idxdoor_live2")
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), refOut)
    // The live indexes start from the IDENTICAL built asset (file
    // copy), so any divergence below is the door's, not training
    // nondeterminism.
    copyTree(Paths.get(refOut), Paths.get(liveOut))
    copyTree(Paths.get(refOut), Paths.get(liveOut2))

    // Reference: one-shot batch admission under a b<batchId>-style key,
    // RE-DELIVERED once — the replayed-micro-batch idempotence the door
    // relies on, pinned directly at the addBatch seam.
    val bDocs = docs.where(col("doc_id") >= cut)
    val bRaw = raw.where(col("vec_id") >= cut)
    HybridIndex.addBatch(spark, refOut, bDocs, bRaw, segKeyOpt = Some("b42"))
    val refServed = served(refOut)
    HybridIndex.addBatch(spark, refOut, bDocs, bRaw, segKeyOpt = Some("b42"))
    assert(served(refOut) == refServed,
      "a re-delivered b<batchId> admission changed the index")

    // Live: the B slice rides the bus as two waves with a KILL/RESTART
    // between them; maxOffsetsPerTrigger forces multiple micro-batches
    // (multiple b<N> segments) inside each wave.
    val busRoot = tmpDir("idxdoor_bus"); val ck = tmpDir("idxdoor_ck")
    val bRows = Tables.documents(spark, dir).where(col("doc_id") >= cut)
      .join(raw.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select("doc_id", "source", "text", "embedding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getSeq[Float](3)))
      .sortBy(_._1)
    val (wave1, wave2) = bRows.splitAt(bRows.length / 2)
    def feed(wave: Array[(Long, String, String, Seq[Float])]): Unit =
      wave.groupBy(_._1 % 2).foreach { case (p, rs) =>
        FileBus.append(busRoot, "docs", p.toInt,
          rs.map { case (id, src, t, e) => IndexDoor.encodeDoc(id, src, t, e, id) }.toSeq)
      }

    feed(wave1)
    val q1 = IndexDoor.run(spark, busRoot, "docs", liveOut, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try q1.processAllAvailable() finally q1.stop() // kill mid-admission
    feed(wave2)
    val q2 = IndexDoor.run(spark, busRoot, "docs", liveOut, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try q2.processAllAvailable() finally q2.stop()

    // Admission genuinely happened in multiple committed micro-batches.
    val mRoot = new java.io.File(s"$liveOut/manifest")
    val maxV = mRoot.listFiles().map(_.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).max
    val segs = spark.read.parquet(s"$liveOut/manifest/v=$maxV")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(segs.count(_.startsWith("b")) >= 2,
      s"expected multiple b<batchId> segments, got $segs")

    // The composed guarantee: streamed-and-restarted == batch, byte-equal.
    assert(served(liveOut) == refServed,
      "door-admitted index diverged from the one-shot batch admission")

    // PERIODIC COMPACTION door over the same (now complete) bus: the
    // standing door's segment count stays bounded — compact folds the
    // live set after every 2nd batch — and the served output is still
    // byte-equal to the one-shot admission.
    val q3 = IndexDoor.run(spark, busRoot, "docs", liveOut2, tmpDir("idxdoor_ck2"),
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      compactEvery = Some(2))
    try q3.processAllAvailable() finally q3.stop()
    def liveSegs(out: String): Seq[String] = {
      val mr = new java.io.File(s"$out/manifest")
      val v = mr.listFiles().map(_.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong).max
      spark.read.parquet(s"$out/manifest/v=$v").collect().map(_.getString(0)).toSeq
    }
    assert(liveSegs(liveOut2).size <= 2,
      s"compactEvery=2 must bound the live set, got ${liveSegs(liveOut2)}")
    assert(served(liveOut2) == refServed,
      "compacting door diverged from the one-shot batch admission")

    // A batch REPLAYED ACROSS a compaction (crash between the in-batch
    // compact and the offset commit) must no-op: its key is in the
    // compact segment's folded list, so re-admission would double-count
    // rows the fold already holds.
    HybridIndex.addBatch(spark, liveOut2,
      docs.where(col("doc_id") >= cut), raw.where(col("vec_id") >= cut),
      segKeyOpt = Some("b0"))
    assert(liveSegs(liveOut2).size <= 2 && served(liveOut2) == refServed,
      "a folded batch key replayed after compaction must be a committed-epoch no-op")

    // SECOND CONSUMER, SAME BUS (the Kafka consumer-group shape): the
    // drift monitor rides the identical wire records under its OWN
    // checkpoint, and its standing per-source histograms equal the
    // batch feature counts of everything the producers published —
    // [[RetrainTrigger.decideOnline]]'s drift leg reads exactly this
    // state (decideOnline == decide is RetrainTriggerSpec's pin).
    val mck = tmpDir("idxdoor_mck")
    val qm = IndexDoor.monitor(spark, busRoot, "docs", mck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try qm.processAllAvailable() finally qm.stop()
    val model = graft.streaming.DriftStream.modelFromCheckpoint(spark, mck)
    val batchCounts = graft.operators.DsirSelect.featureRows(
        Tables.documents(spark, dir).where(col("doc_id") >= cut)
          .select(col("doc_id"), col("source"), col("text")), "")
      .groupBy("source", "b")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cs"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(model == batchCounts,
      s"bus-fed monitor histograms diverged from batch feature counts for " +
        s"${model.keySet.union(batchCounts.keySet).filter(s =>
          model.getOrElse(s, Map.empty) != batchCounts.getOrElse(s, Map.empty)).take(3)}")
  }

  /** The LIVE maintenance loop closed end to end (round-11 verdict #2):
    * a standing door admits a DRIFTED feed, the standing monitor's
    * checkpoint state fires [[graft.operators.RetrainTrigger.decideOnline]],
    * [[HybridIndex.retrain]] blue/green-rebuilds into a new directory
    * MID-STREAM (the flip is a kill/restart of the door onto the new
    * index — that IS the blue/green op; the bus offsets carry in the
    * door's own checkpoint), the drift reference is re-recorded over
    * the retrain-time corpus, admission continues into the new index,
    * and the final served output is BYTE-identical to a fresh
    * monolithic build over the pre-flip corpus plus a frozen-codebook
    * admission of the post-flip slice. Plus the flip's crash seam: a
    * pre-flip b<batchId> re-delivered AGAINST THE RETRAINED index
    * (door killed after addBatch, before its offset commit) must
    * no-op — retrain carries the old index's committed-epoch ledger. */
  test("retrain flip mid-stream: decideOnline fires, door continues onto the retrained index exactly-once") {
    import org.apache.spark.sql.functions._
    val dirA = tmpDir("flip_a"); val dirB = tmpDir("flip_b")
    val twin = tmpDir("flip_twin")
    val busRoot = tmpDir("flip_bus"); val ck = tmpDir("flip_ck")
    val mck = tmpDir("flip_mck")
    val driftPhrase =
      (0 until 50).map(i => s"zdrift${i % 7}x${i % 5}").mkString(" ", " ", "")

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    val refDocs = docs.where(col("doc_id") < cut)
    HybridIndex.build(spark, refDocs.select(col("doc_id"), col("text")),
      raw.where(col("vec_id") < cut), dirA)
    graft.operators.RetrainTrigger.recordHealthBaseline(spark, dirA)
    graft.operators.RetrainTrigger.recordDriftReference(spark, dirA, refDocs)

    // The admitted feed GENUINELY drifts in both coordinates: +0.5 mean
    // shift away from the frozen codebooks (the quant-err coordinate)
    // and a vocabulary shift in the text (the drift_l1 coordinate) —
    // the RetrainTriggerSpec calibration fixtures, pushed through the
    // live wire.
    val bRows = docs.where(col("doc_id") >= cut)
      .withColumn("text", concat(col("text"), lit(driftPhrase)))
      .join(raw.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .withColumn("embedding",
        expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))"))
      .select("doc_id", "source", "text", "embedding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getSeq[Float](3)))
      .sortBy(_._1)
    val (wave1, wave2) = bRows.splitAt(bRows.length / 2)
    def feed(wave: Array[(Long, String, String, Seq[Float])]): Unit =
      wave.groupBy(_._1 % 2).foreach { case (p, rs) =>
        FileBus.append(busRoot, "docs", p.toInt,
          rs.map { case (id, src, t, e) => IndexDoor.encodeDoc(id, src, t, e, id) }.toSeq)
      }

    // EPOCH 1: door + monitor consume the first drifted wave into dirA.
    feed(wave1)
    val q1 = IndexDoor.run(spark, busRoot, "docs", dirA, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try q1.processAllAvailable() finally q1.stop()
    val qm1 = IndexDoor.monitor(spark, busRoot, "docs", mck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try qm1.processAllAvailable() finally qm1.stop()

    // The STANDING decision fires: drift rows trip on the vocabulary
    // shift, quant_err trips on the mean shift (recall stays blind to
    // pure data drift — the calibration fact).
    val decision = graft.operators.RetrainTrigger.decideOnline(spark, dirA,
      graft.streaming.DriftStream.modelFromCheckpoint(spark, mck)).collect()
    val byMetric = decision.groupBy(_.getString(1))
    assert(byMetric("drift_l1").forall(_.getString(3) == "retrain"),
      s"drifted feed must fire every drift row, got ${byMetric("drift_l1").toSeq.take(3)}")
    assert(byMetric("quant_err").head.getString(3) == "retrain",
      s"mean-shifted admission must fire quant_err, got ${byMetric("quant_err").head}")

    // ACTUATOR + FLIP: blue/green retrain into dirB, re-record the
    // drift reference over the retrain-time corpus (build slice + the
    // drifted admissions — the new "normal"), restart the door onto
    // dirB under the SAME checkpoint; the second wave admits into the
    // retrained index against its fresh codebooks.
    HybridIndex.retrain(spark, dirA, dirB)
    import spark.implicits._
    val wave1Docs = wave1.map(r => (r._1, r._2, r._3)).toSeq
      .toDF("doc_id", "source", "text")
    graft.operators.RetrainTrigger.recordDriftReference(spark, dirB,
      refDocs.unionByName(wave1Docs))
    feed(wave2)
    val q2 = IndexDoor.run(spark, busRoot, "docs", dirB, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try q2.processAllAvailable() finally q2.stop()
    val flipped = served(dirB)

    // THE CRASH SEAM: a pre-flip b<batchId> re-delivered against the
    // retrained index (addBatch landed in dirA, offset never committed,
    // replay routed to dirB) must be a committed-epoch no-op — dirA's
    // b-keys rode into dirB's folded ledger.
    val preFlipKey = spark.read.parquet(
        s"$dirA/manifest").select("seg").collect().map(_.getString(0))
      .filter(_.startsWith("b")).sorted.head
    val w1Ids = wave1.map(_._1).toSet
    HybridIndex.addBatch(spark, dirB,
      wave1Docs.select(col("doc_id"), col("text"))
        .where(col("doc_id").isin(w1Ids.take(20).toSeq: _*)),
      raw.where(col("vec_id").isin(w1Ids.take(20).toSeq: _*)),
      segKeyOpt = Some(preFlipKey))
    assert(served(dirB) == flipped,
      s"pre-flip batch $preFlipKey replayed against the retrained index must no-op")

    // BYTE-IDENTICAL to the offline twin: fresh monolithic build over
    // the pre-flip corpus (A + drifted wave 1 — exactly the committed
    // base retrain re-trained on), then a frozen-codebook admission of
    // wave 2. Two different code paths (blue/green fold-carry vs
    // re-derive from raw text/floats) forced to the same answer, LIVE.
    def rowsDf(rows: Array[(Long, String, String, Seq[Float])]) = {
      val d = rows.map(r => (r._1, r._3)).toSeq.toDF("doc_id", "text")
      val e = rows.map(r => (r._1, r._4)).toSeq.toDF("vec_id", "embedding")
      (d, e.withColumn("embedding", col("embedding").cast("array<float>")))
    }
    val (w1d, w1e) = rowsDf(wave1)
    val (w2d, w2e) = rowsDf(wave2)
    HybridIndex.build(spark,
      refDocs.select(col("doc_id"), col("text")).unionByName(w1d),
      raw.select(col("vec_id"), col("embedding"))
        .where(col("vec_id") < cut).unionByName(w1e), twin)
    HybridIndex.addBatch(spark, twin, w2d, w2e)
    assert(flipped.nonEmpty && flipped == served(twin),
      s"post-flip serve diverged from the fresh-build twin: " +
        s"diff=${(flipped.toSet -- served(twin).toSet).take(3)}")

    // The loop CLOSES: with the reference re-recorded and the codebooks
    // retrained, the standing health verdicts return to keep.
    val qm2 = IndexDoor.monitor(spark, busRoot, "docs", mck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try qm2.processAllAvailable() finally qm2.stop()
    val post = graft.operators.RetrainTrigger.decideOnline(spark, dirB,
      graft.streaming.DriftStream.modelFromCheckpoint(spark, mck)).collect()
    assert(post.filter(_.getString(0) == "__index").forall(_.getString(3) == "keep"),
      s"post-retrain index health must keep, got ${post.filter(_.getString(0) == "__index").toSeq}")
  }

  /** r12 verdict #3: the graph/community maintenance loop COMPOSED
    * under the standing door — qx110's admit==rebuild hash run LIVE
    * against door-admitted micro-batches, plus the warm-start
    * community fixpoint, plus the re-delivery seam (a version records
    * its b<batchId> seg key and a replay no-ops). */
  test("graph/community maintenance rides the door: admit == rebuild, warm labels are a fixpoint") {
    import org.apache.spark.sql.functions._
    import graft.operators.{EmbeddingLsh, GraphAnn, GraphIndex, LabelPropagation}
    val idxOut = tmpDir("gdoor_idx"); val gOut = tmpDir("gdoor_graph")
    val busRoot = tmpDir("gdoor_bus"); val ck = tmpDir("gdoor_ck")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    val expectedFinal = ids.length.toLong // capacity-planned plane schedule
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), idxOut)
    GraphIndex.init(spark, idxOut, gOut, expectedFinal, k = 4, lpaIters = 4)

    // the delta rides the bus in two waves with a kill/restart between
    // them; small triggers force several graph admissions per wave
    val bRows = Tables.documents(spark, dir).where(col("doc_id") >= cut)
      .join(raw.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select("doc_id", "source", "text", "embedding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getSeq[Float](3)))
      .sortBy(_._1)
    val (wave1, wave2) = bRows.splitAt(bRows.length / 2)
    def feed(wave: Array[(Long, String, String, Seq[Float])]): Unit =
      wave.groupBy(_._1 % 2).foreach { case (p, rs) =>
        FileBus.append(busRoot, "docs", p.toInt,
          rs.map { case (id, src, t, e) => IndexDoor.encodeDoc(id, src, t, e, id) }.toSeq)
      }
    feed(wave1)
    val q1 = IndexDoor.run(spark, busRoot, "docs", idxOut, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      graphDir = Some(gOut))
    try q1.processAllAvailable() finally q1.stop()
    feed(wave2)
    val q2 = IndexDoor.run(spark, busRoot, "docs", idxOut, ck,
      maxOffsetsPerTrigger = Some(64L),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      graphDir = Some(gOut))
    try q2.processAllAvailable() finally q2.stop()

    // several incremental graph versions actually committed
    val vDirs = new java.io.File(gOut).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    assert(vDirs.length >= 3, s"expected init + >=2 admissions, got v=$vDirs")

    // (a) the LIVE qx110 pin: the door-maintained graph equals a full
    // rebuild over the committed union under the SAME pinned planes
    def edgeSet(g: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      g.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    val base = HybridIndex.committedBase(spark, idxOut)
    val planes = spark.read.parquet(s"$gOut/meta.parquet").head.getInt(0)
    assert(planes === EmbeddingLsh.planesFor(expectedFinal))
    val rebuilt = GraphAnn.knnGraph(base,
      EmbeddingLsh.candidatePairs(
        EmbeddingLsh.bandSigs(base.select("vec_id", "iv"), planes)), k = 4)
    assert(edgeSet(GraphIndex.graph(spark, gOut)) === edgeSet(rebuilt),
      "door-maintained graph diverged from the full rebuild")

    // (b) communities refresh on the MAINTENANCE cadence (the 374 s
    // probe finding: re-propagation is edge-linear per round, so it
    // amortizes like compact): one refresh labels the latest graph
    // version, and the warm-start labeling is a FIXPOINT of the
    // synchronous update on the final candidate graph (one more round
    // returns it unchanged — the LabelPropagationSpec corpus pin,
    // reached here through the door's warm-start chain) covering
    // exactly the committed node set; a second refresh no-ops.
    GraphIndex.refreshCommunities(spark, idxOut, gOut)
    val labels = GraphIndex.labels(spark, gOut)
    GraphIndex.refreshCommunities(spark, idxOut, gOut) // idempotent
    val candEdges = EmbeddingLsh.candidatePairs(
        EmbeddingLsh.bandSigs(base.select("vec_id", "iv"), planes))
      .select(col("vec_a").as("u"), col("vec_b").as("v"))
    def lm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val warm = lm(labels)
    assert(warm.keySet === ids.map(_.toLong).toSet, "labels must cover the committed corpus")
    val oneMore = lm(LabelPropagation.run(
      base.select(col("vec_id").as("u")), candEdges, 1, init = Some(labels)))
    assert(oneMore === warm, "warm-start labeling must be a fixpoint")

    // (b2) SERVE from the maintained asset (r14, r13 verdict #1 — the
    // graph's first consumer beyond its own audits): GraphIndex.search
    // over the committed snapshot is BIT-equal to the inline qx109
    // spelling (fresh corpus signing, fresh rebuild, same pinned
    // planes/beam/rounds/entry), and its recall@top1 vs brute is
    // computed LIVE on the asset (the qx121 discipline).
    val qs = base.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))
    def beamSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        round9(r.getDouble(3)))).toSet
    val servedAsset = GraphIndex.search(spark, idxOut, gOut, qs)
    val servedTwin = GraphAnn.inlineServe(base, planes, qs, k = 4,
      beam = 4, rounds = 3)
    assert(beamSet(servedAsset) === beamSet(servedTwin),
      "asset serve must be bit-equal to the inline qx109 spelling over the rebuild")
    val brute1 = base.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr("long_dot(iv, qiv)"))
      .withColumn("cosine", expr(graft.queries.ExtQueries.COSINE))
      .groupBy("qid").agg(expr("topk_by(cosine, vec_id, 1)").as("tk"))
      .select(col("qid"), explode(col("tk")).as("t"))
      .select(col("qid"), col("t.id").as("nn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val beams = servedAsset.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
    val found = brute1.count { case (q, nn) =>
      beams.getOrElse(q, Array.empty).exists(_._2 == nn) }
    info(s"asset-served recall@top1 = $found/${brute1.size}")
    assert(found > 0, "the asset serve must find brute nearest neighbors")

    // (b3) the maintained labels are the BUDGETING input (r14, r13
    // verdict #2): the qx116 community-cap audit computed from
    // GraphIndex.labels equals the inline spelling — a cold qx102-style
    // labeling over the same committed corpus — so the cadence-
    // refreshed asset demonstrably feeds the mixing caps.
    val toks = Tables.documents(spark, dir)
      .join(base.select(col("vec_id").as("doc_id")), "doc_id")
      .select(col("doc_id").as("u"),
        expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)")
          .as("nt"))
    val coldLabels = LabelPropagation.run(
      base.select(col("vec_id").as("u")), candEdges, 4, init = None)
    def auditRows(labelsDf: org.apache.spark.sql.DataFrame) =
      graft.queries.ExtQueries.communityCapAudit(labelsDf, toks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(auditRows(GraphIndex.labels(spark, gOut)) === auditRows(coldLabels),
      "community caps from the maintained labels must equal the inline qx116 spelling")

    // (c) the re-delivery seam: replaying an already-recorded seg key
    // must no-op (no new version, snapshot unchanged)
    val before = vDirs.max
    GraphIndex.admit(spark, idxOut, gOut,
      spark.range(1).select(lit(ids.head.toLong).as("id")), s"b0")
    val after = new java.io.File(gOut).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).max
    assert(after === before, "a re-delivered seg key must not mint a new version")

    // (d) supersede-time vacuum: within grace NOTHING deletes
    // (retention follows the recorded commit times, not mtimes);
    // grace-0 retires every superseded graph AND labels version,
    // keeps the latest of each, and never touches the sigs segments
    assert(GraphIndex.vacuum(spark, gOut).isEmpty,
      "default grace must protect every superseded version")
    val servedBefore = GraphIndex.graph(spark, gOut).count()
    val labelsBefore = GraphIndex.labels(spark, gOut).count()
    val gone = GraphIndex.vacuum(spark, gOut, graceMs = 0L)
    assert(gone.nonEmpty, "grace-0 must retire superseded versions")
    val left = new java.io.File(gOut).listFiles().map(_.getName)
      .filter(n => n.startsWith("v=")).map(_.stripPrefix("v=").toLong)
    assert(left.toSeq === Seq(before), s"only the latest graph version survives, got $left")
    assert(GraphIndex.graph(spark, gOut).count() === servedBefore,
      "the served snapshot must be untouched by vacuum")
    assert(GraphIndex.labels(spark, gOut).count() === labelsBefore,
      "the newest labeling must be untouched by vacuum")
    assert(new java.io.File(s"$gOut/sigs").listFiles().nonEmpty,
      "sig segments are shared by all versions and never vacuumed")
  }
}
