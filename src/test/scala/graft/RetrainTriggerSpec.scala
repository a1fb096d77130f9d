package graft

import org.apache.spark.sql.functions._

import graft.operators.{HybridIndex, RetrainTrigger}
import graft.sources.Tables

/** [[RetrainTrigger]]: the decision loop must (a) stay quiet on the
  * natural corpus split (the gate row qx94 pins the exact statistic
  * and verdict against DuckDB — here we pin the DIRECTION), and (b)
  * actually fire on injected shifts in BOTH coordinates: a vocabulary
  * shift in the admitted text (drift leg) and an embedding-space shift
  * away from the frozen codebooks (recall leg). Thresholds are the
  * pinned constants, not tuned per test. */
class RetrainTriggerSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  // The calibration probe's injection: 50 drift tokens per admitted doc.
  private val driftPhrase =
    (0 until 50).map(i => s"zdrift${i % 7}x${i % 5}").mkString(" ", " ", "")

  test("drift leg: natural split keeps every source; injected vocabulary shift retrains every source") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val cut = 3L * docs.count() / 5L
    val ref = docs.where(col("doc_id") < cut)
    val cur = docs.where(col("doc_id") >= cut)

    val natural = RetrainTrigger.driftVsRef(ref, cur).collect()
    assert(natural.nonEmpty)

    // The one-pass split spelling is bit-identical to the two-pass one
    // (qx94 runs it; the oracle transitively pins it too).
    val split = RetrainTrigger.driftSplit(docs, col("doc_id") < cut).collect()
    assert(split.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      natural.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      "driftSplit must equal driftVsRef cell-for-cell")
    assert(natural.forall(_.getLong(2) <= RetrainTrigger.L1ThresholdMicro),
      s"natural split must sit under the pinned threshold, got " +
        s"${natural.map(r => r.getString(0) -> r.getLong(2)).toSeq.sortBy(-_._2).take(3)}")

    val drifted = cur.withColumn("text", concat(col("text"), lit(driftPhrase)))
    val alarm = RetrainTrigger.driftVsRef(ref, drifted).collect()
    assert(alarm.forall(_.getLong(2) > RetrainTrigger.L1ThresholdMicro),
      s"injected 50-token shift must trip every source, got " +
        s"${alarm.map(r => r.getString(0) -> r.getLong(2)).toSeq.sortBy(_._2).take(3)}")

    // One-pass full+sampled (the qx97 kernel): each leg bit-identical
    // to a two-pass driftSplit over the corresponding corpus slice.
    val sampPred = pmod(col("doc_id"), lit(2L)) === 0L
    val (fullT, sampT) = RetrainTrigger.driftSplitSampled(docs, col("doc_id") < cut, sampPred)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cells(fullT) == natural.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      "driftSplitSampled's full leg must equal driftSplit")
    assert(cells(sampT) ==
      cells(RetrainTrigger.driftSplit(docs.where(sampPred), col("doc_id") < cut)),
      "driftSplitSampled's sampled leg must equal a two-pass sampled driftSplit")
  }

  test("index-health legs + composed decision: healthy keeps; mean-shift fires quant_err; corrupt codebooks fire recall") {
    val healthyIdx = tmpDir("retrain_ok")
    val driftedIdx = tmpDir("retrain_bad")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docsS = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), healthyIdx)
    // Identical build for the drifted twin (deterministic training on
    // the same slice — and cheap insurance: copy nothing, retrain).
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), driftedIdx)

    // Build-time health baselines (identical builds ⇒ identical
    // baselines; asserted, since the relative rules lean on them).
    val (rec1, err1) = RetrainTrigger.recordHealthBaseline(spark, healthyIdx)
    val (rec2, err2) = RetrainTrigger.recordHealthBaseline(spark, driftedIdx)
    assert(rec1 > 0L && err1 > 0L && rec1 == rec2 && err1 == err2,
      s"deterministic builds must share baselines, got ($rec1,$err1) vs ($rec2,$err2)")

    // HEALTHY epoch: the real B slice admitted; composed decision
    // keeps every row (drift under threshold, quant err ~1.06×
    // baseline, recall holds well above the 0.5× floor).
    HybridIndex.addBatch(spark, healthyIdx, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))
    val ref = docsS.where(col("doc_id") < cut)
    val cur = docsS.where(col("doc_id") >= cut)
    val keepRows = RetrainTrigger.decide(spark, healthyIdx, ref, cur).collect()
    assert(keepRows.exists(_.getString(1) == "dense_recall") &&
      keepRows.exists(_.getString(1) == "quant_err") &&
      keepRows.count(_.getString(1) == "drift_l1") > 0)
    assert(keepRows.forall(_.getString(3) == "keep"),
      s"healthy epoch must keep, got ${keepRows.filter(_.getString(3) != "keep").take(3).toSeq}")

    // DRIFTED epoch: +0.5 mean shift on the admitted embeddings — a
    // genuine distribution shift AWAY from the frozen codebooks. The
    // calibration fact this spec pins: reconstruction error explodes
    // (10.4× baseline measured) while dense recall stays FLAT in the
    // iid near-tie regime — recall is blind to data drift, the
    // quant-err coordinate is not. Text also drifts, so drift rows
    // fire too.
    HybridIndex.addBatch(spark, driftedIdx, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut)
        .withColumn("embedding", expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))")))
    val retrainRows = RetrainTrigger.decide(spark, driftedIdx, ref,
      cur.withColumn("text", concat(col("text"), lit(driftPhrase)))).collect()
    val byMetric = retrainRows.groupBy(_.getString(1))
    assert(byMetric("drift_l1").forall(_.getString(3) == "retrain"),
      "text shift must fire every drift row")
    assert(byMetric("quant_err").head.getString(3) == "retrain",
      s"mean-shifted admission must fire quant_err, got ${byMetric("quant_err").head}")
    assert(byMetric("dense_recall").head.getString(3) == "keep",
      "measured fact: recall stays flat under pure data drift (the reason quant_err exists)")

    // RETRAIN — the actuator: fresh codebooks trained on the committed
    // (shifted) base restore the quantizer fit, the lexical statistics
    // carry over exactly, and the next decide epoch's index rows keep.
    val retrained = tmpDir("retrain_new")
    val (newRec, newErr) = HybridIndex.retrain(spark, driftedIdx, retrained)
    assert(newRec > 0L)
    val (_, oldErr) = HybridIndex.quantErrMean(spark, driftedIdx)
    assert(newErr * 2 < oldErr,
      s"retraining must at least halve the reconstruction error, got $newErr vs $oldErr")
    def lexStats(idx: String): (Long, Long) = {
      val r = spark.read.parquet(s"$idx/stats_parts.parquet")
        .agg(sum("n"), sum("sumdl")).head
      (r.getLong(0), r.getLong(1))
    }
    assert(lexStats(retrained) == lexStats(driftedIdx),
      "retrain must carry the lexical statistics over fold-identically")
    val post = RetrainTrigger.decide(spark, retrained, ref,
      cur.withColumn("text", concat(col("text"), lit(driftPhrase)))).collect()
    assert(post.filter(_.getString(0) == "__index").forall(_.getString(3) == "keep"),
      s"post-retrain index health must keep, got ${post.filter(_.getString(0) == "__index").toSeq}")

    // SERVING corruption: zero the PQ codebooks (the ops failure the
    // recall monitor exists for) — ADC ordering collapses to the
    // vec_id tie-break and recall falls below half baseline.
    val pq = spark.read.parquet(s"$healthyIdx/pq_books.parquet")
      .withColumn("cv", expr("transform(cv, x -> 0L)"))
    val pqRows = pq.collect()
    spark.createDataFrame(java.util.Arrays.asList(pqRows: _*), pq.schema)
      .write.mode("overwrite").parquet(s"$healthyIdx/pq_books.parquet")
    val (_, corruptRec) = HybridIndex.denseRecallMicro(spark, healthyIdx)
    assert(corruptRec * 1000000L < rec1 * RetrainTrigger.RecallKeepFractionMicro,
      s"zeroed codebooks must collapse recall below half baseline, got $corruptRec vs $rec1")
  }

  test("sampled health legs: the pinned vec_id sample reproduces the full-scan verdicts on healthy AND drifted fixtures") {
    // Round-11 verdict #3: the quant-err and recall legs were the
    // decision loop's one linear-in-corpus term. The sample rule is
    // vec_id % 4 == 0 (deterministic, persisted IN the baseline so
    // every epoch replays it); this spec pins that the sampled
    // verdicts equal the full-scan verdicts on both calibration
    // fixtures while measuring a strictly smaller population.
    import java.nio.file.{Files, Paths, Path => JPath}
    def copyTree(src: JPath, dst: JPath): Unit =
      Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      }
    val fullH = tmpDir("samp_full_h"); val sampH = tmpDir("samp_samp_h")
    val fullD = tmpDir("samp_full_d"); val sampD = tmpDir("samp_samp_d")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docsS = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), fullH)
    Seq(sampH, fullD, sampD).foreach(d => copyTree(Paths.get(fullH), Paths.get(d)))
    RetrainTrigger.recordHealthBaseline(spark, fullH)
    RetrainTrigger.recordHealthBaseline(spark, fullD)
    RetrainTrigger.recordHealthBaseline(spark, sampH, sampleEvery = 4L)
    RetrainTrigger.recordHealthBaseline(spark, sampD, sampleEvery = 4L)

    // The sampled legs measure the pinned sub-corpus, not the full base.
    val (nFull, _) = HybridIndex.quantErrMean(spark, fullH)
    val (nSamp, _) = HybridIndex.quantErrMean(spark, sampH,
      HybridIndex.healthSamplePred(4L))
    assert(nSamp * 3 <= nFull && nSamp > 0,
      s"sampled quant-err must decode ~1/4 of the base, got $nSamp of $nFull")

    val bDocs = docs.where(col("doc_id") >= cut)
    val bRawHealthy = raw.where(col("vec_id") >= cut)
    val bRawShifted = bRawHealthy
      .withColumn("embedding", expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))"))
    HybridIndex.addBatch(spark, fullH, bDocs, bRawHealthy)
    HybridIndex.addBatch(spark, sampH, bDocs, bRawHealthy)
    HybridIndex.addBatch(spark, fullD, bDocs, bRawShifted)
    HybridIndex.addBatch(spark, sampD, bDocs, bRawShifted)

    val ref = docsS.where(col("doc_id") < cut)
    val cur = docsS.where(col("doc_id") >= cut)
    val curDrift = cur.withColumn("text", concat(col("text"), lit(driftPhrase)))
    def indexVerdicts(idx: String, curDf: org.apache.spark.sql.DataFrame) =
      RetrainTrigger.decide(spark, idx, ref, curDf).collect()
        .filter(_.getString(0) == "__index")
        .map(r => r.getString(1) -> r.getString(3)).toMap
    val fullHealthy = indexVerdicts(fullH, cur)
    val sampHealthy = indexVerdicts(sampH, cur)
    assert(fullHealthy.values.forall(_ == "keep") && sampHealthy == fullHealthy,
      s"sampled healthy verdicts must match full-scan: $sampHealthy vs $fullHealthy")
    val fullDrift = indexVerdicts(fullD, curDrift)
    val sampDrift = indexVerdicts(sampD, curDrift)
    assert(fullDrift("quant_err") == "retrain" && fullDrift("dense_recall") == "keep",
      s"drifted fixture must fire quant_err and hold recall, got $fullDrift")
    assert(sampDrift == fullDrift,
      s"sampled drifted verdicts must match full-scan: $sampDrift vs $fullDrift")

    // retrain carries the sample rate into the fresh baseline, so the
    // post-retrain decision loop keeps measuring under the same rule.
    val retrained = tmpDir("samp_retrained")
    HybridIndex.retrain(spark, sampD, retrained)
    val h = spark.read.parquet(s"$retrained/health.parquet").head
    assert(h.getAs[Long]("sample_every") == 4L,
      "retrain must carry the pinned sample rate into the fresh baseline")
    val postVerdicts = indexVerdicts(retrained, curDrift)
    assert(postVerdicts.values.forall(_ == "keep"),
      s"post-retrain sampled health must keep, got $postVerdicts")
  }

  test("sample-rate derivation rule: power-of-two rate keeping the population at the floor (r12 verdict #7)") {
    import RetrainTrigger.sampleEveryFor
    // below 2x floor: scan outright
    assert(sampleEveryFor(0L) === 1L)
    assert(sampleEveryFor(49999L) === 1L)
    assert(sampleEveryFor(99999L) === 1L)
    // doubling past it: n/rate stays in [floor, 2*floor)
    assert(sampleEveryFor(100000L) === 2L)
    assert(sampleEveryFor(200000L) === 4L)
    assert(sampleEveryFor(399999L) === 4L)
    assert(sampleEveryFor(400000L) === 8L)
    // the invariant itself, across magnitudes
    for (n <- Seq(1L, 75000L, 123456L, 1000000L, 50000000L, 10000000000L)) {
      val r = sampleEveryFor(n)
      assert((r & (r - 1)) === 0L, s"rate must be a power of two, got $r for n=$n")
      assert(r === 1L || n / r >= RetrainTrigger.SampleFloor,
        s"sampled population must hold the floor, n=$n r=$r")
      assert(n / (r * 2) < RetrainTrigger.SampleFloor,
        s"rate must be the largest such power, n=$n r=$r")
    }
    // and a custom floor exercises the same contract
    assert(sampleEveryFor(800L, floor = 100L) === 8L)

    // recordHealthBaseline's default derives and persists the inputs:
    // at fixture scale the rule picks 1 (the full scan it always was)
    val idx = tmpDir("derive_rate")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    HybridIndex.build(spark, docs, raw, idx)
    RetrainTrigger.recordHealthBaseline(spark, idx)
    val h = spark.read.parquet(s"$idx/health.parquet").head
    assert(h.getAs[Long]("sample_every") === 1L, "fixture scale must resolve to full scan")
    assert(h.getAs[Long]("n_base") === raw.count(), "derivation input must be recorded")
    assert(h.getAs[Long]("sample_floor") === RetrainTrigger.SampleFloor)
  }

  test("standing decision: decideOnline from the DriftStream model == decide from the corpus") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DriftStream
    import graft.streaming.DriftStream.SrcShardFeats
    val idx = tmpDir("retrain_online")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docsS = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val raw = Tables.embeddings(spark, dir)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    val ref = docsS.where(col("doc_id") < cut)
    val cur = docsS.where(col("doc_id") >= cut)
    HybridIndex.build(spark, docs.where(col("doc_id") < cut),
      raw.where(col("vec_id") < cut), idx)
    RetrainTrigger.recordHealthBaseline(spark, idx)
    RetrainTrigger.recordDriftReference(spark, idx, ref)
    HybridIndex.addBatch(spark, idx, docs.where(col("doc_id") >= cut),
      raw.where(col("vec_id") >= cut))

    // The admitted docs flow through the ONLINE monitor (with a replay
    // split mid-feed); the standing state IS the drift leg's input.
    val curRows = cur.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      .flatMap { case (id, src, text) => DriftStream.shardRows(src, id, text) }.toSeq
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[SrcShardFeats]
    val input = MemoryStream[SrcShardFeats]
    val ckpt = tmpDir("retrain_online_ck")
    val q = DriftStream.histograms(input.toDS())
      .writeStream.format("memory").queryName("retrain_drift")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      curRows.grouped(curRows.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      input.addData(curRows.take(40)); q.processAllAvailable() // replay
    } finally q.stop()

    def table(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3))).toMap
    val online = table(RetrainTrigger.decideOnline(spark, idx,
      DriftStream.modelFromCheckpoint(spark, ckpt)))
    val batch = table(RetrainTrigger.decide(spark, idx, ref, cur))
    assert(online == batch,
      s"standing decision diverged from the corpus-scan decision: " +
        s"diff=${(online.toSet -- batch.toSet).take(3)}")

    // RETRAIN == FRESH BUILD, end to end: retraining the healthy index
    // (books re-trained on the committed A∪B base, lexical folded
    // over) must serve BYTE-identically to a monolithic build over the
    // same corpus — two different code paths (fold-carry vs re-derive
    // from raw text/floats) forced to the same answer.
    val retrained = tmpDir("retrain_vs_build_r")
    val fresh = tmpDir("retrain_vs_build_f")
    HybridIndex.retrain(spark, idx, retrained)
    HybridIndex.build(spark, docs, raw, fresh)
    def servedT(out: String) = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val sr = servedT(retrained); val sf = servedT(fresh)
    assert(sr.nonEmpty && sr == sf,
      s"retrained index diverged from a fresh build over the same corpus: " +
        s"diff=${(sr.toSet -- sf.toSet).take(3)}")
  }
}
