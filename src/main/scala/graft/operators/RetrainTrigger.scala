package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The RETRAIN DECISION loop (round-10 verdict #3): [[HybridIndex]]'s
  * addBatch contract says codebook drift under a shifting corpus "is
  * the retrain trigger — measured, not silently absorbed"; this is the
  * measurement, composed from the two monitors the engine already
  * ships and held against PINNED thresholds so the output is a
  * decision row, not a dashboard number.
  *
  *  - **Feature drift** (the qx93 statistic retargeted): per source of
  *    the admitted batches, the L1 distance between the batch's hashed
  *    uni+bigram bucket histogram and the BUILD corpus's histogram
  *    ([[DsirSelect]] features, B = 8192 buckets), in integer
  *    micro-units with floor division on both engines — hash-exact, so
  *    the composed decision is oracle-checkable (gate row qx94). The
  *    basis is the UNION of reference and source buckets (a batch
  *    introducing brand-new vocabulary pays for it even where the
  *    reference has no mass).
  *  - **Quantizer fit** ([[HybridIndex.quantErrMean]]): mean PQ
  *    reconstruction error of the committed vectors against the frozen
  *    codebooks — the faiss-style drift coordinate. Measured fact
  *    (calibration runs, sf0.001): a +0.5 mean shift of the admitted
  *    embeddings multiplies the error 10.4× while leaving dense recall
  *    FLAT at ~0.35 — in the iid near-tie regime recall cannot see
  *    distribution drift (a global sign flip is even an exact
  *    distributional no-op for the symmetric fixture), which is why
  *    this coordinate, not recall, carries the drift verdict.
  *  - **Dense-leg recall** ([[HybridIndex.denseRecallMicro]]): the
  *    indexed top-k against the exact brute-force top-k over the same
  *    committed base — the SERVING-QUALITY monitor. Self-relative, not
  *    an absolute floor (achievable recall is corpus geometry: ~0.35
  *    on the iid gate embeddings, 0.9+ on clustered corpora), and it
  *    fires on index damage the other coordinates can't see (e.g.
  *    corrupted codebook assets zero the ADC ordering).
  *
  * Decision rules (pinned): a drift row retrains when `l1_micro >`
  * [[L1ThresholdMicro]] (natural split noise measures ≤ ~730k micro at
  * the small SFs, ≤ ~210k at sf0.1; an injected 30-token shift lands
  * ≥ ~780k); the quant-err row retrains when the error exceeds
  * [[QuantErrGrowthMicro]] × the build-time baseline (healthy
  * admission measures 1.06×, the mean shift 10.4×); the recall row
  * retrains below [[RecallKeepFractionMicro]] × baseline (healthy
  * admission holds 0.75×, zeroed codebooks collapse to near-random).
  * [[graft.RetrainTriggerSpec]] proves keep AND fire for all three.
  *
  * Scale shape: the drift leg is one feature kernel pass per side →
  * (source, bucket) aggregation (≤ sources×B rows, the bounded
  * LocalRelation class) → grid fold; the quant-err leg is one
  * decode-and-diff pass over the committed base (samplable); the
  * recall leg is probe-bound serve + ONE |base|×|probes| brute pass —
  * the declared price of a maintenance decision, run per admission
  * epoch, never per query. */
object RetrainTrigger {

  /** Drift alarm threshold, integer micro-units of L1 mass. */
  val L1ThresholdMicro: Long = 750000L

  /** Keep while current dense recall ≥ this fraction (micro-units,
    * 0.50 — the catastrophic serving-decay floor) of the build-time
    * baseline. */
  val RecallKeepFractionMicro: Long = 500000L

  /** Retrain when mean reconstruction error exceeds this multiple
    * (micro-units, 2.0×) of the build-time baseline. */
  val QuantErrGrowthMicro: Long = 2000000L

  /** The smallest sampled population the health statistics stay stable
    * over (r12 verdict #7 — deriving the rate is no longer the
    * caller's guess): at 50k measured vectors the recall micro
    * statistic's sampling error is ~0.2% and the quant-err mean's
    * relative error smaller still, both far inside the 2×/0.5×
    * decision margins; below it the rate degrades toward full scan. */
  val SampleFloor: Long = 50000L

  /** The PINNED derivation rule: the largest power-of-two rate whose
    * sampled population `n / rate` still meets `floor` — powers of two
    * so successive corpus sizes reuse identical sample sets as long as
    * possible, 1 when the corpus is small enough to scan outright.
    * Recorded in `health.parquet` (rate + the inputs it came from) so
    * the choice is auditable and every epoch replays it by
    * construction. */
  def sampleEveryFor(n: Long, floor: Long = SampleFloor): Long = {
    require(floor > 0, "sample floor must be positive")
    var r = 1L
    while (n / (r * 2L) >= floor) r *= 2L
    r
  }

  /** Measure the fresh index's dense recall AND quantizer fit and
    * persist them as the health baseline (`health.parquet`) the
    * decision loop compares against — call once after
    * [[HybridIndex.build]] (kept OUT of build itself so the probes
    * never ride the build-time benchmarks). Returns
    * (baseline recall micro, baseline quant-err mean).
    *
    * `sampleEvery > 1` measures BOTH legs over the pinned
    * [[HybridIndex.healthSamplePred]] sub-corpus (round-11 verdict #3
    * — the full-scan epoch cost was the loop's one linear-in-corpus
    * term), and the rate is persisted IN the baseline so every
    * subsequent [[decide]]/[[decideOnline]] epoch replays the
    * identical rule — baseline and epoch can never silently measure
    * different sub-corpora ([[graft.RetrainTriggerSpec]] pins the
    * sampled verdicts == the full-scan verdicts on both the healthy
    * and the drifted fixtures).
    *
    * `sampleEvery = 0` (the default since round 13) DERIVES the rate
    * from the committed corpus size with [[sampleEveryFor]] — 1 below
    * 2×[[SampleFloor]] vectors (scan outright), doubling as the corpus
    * doubles past it — and persists the derivation inputs
    * (`n_base`, `sample_floor`) next to the resolved rate so the
    * choice is auditable from the baseline alone. Pass an explicit
    * rate to override (the calibration fixtures do). */
  def recordHealthBaseline(spark: SparkSession, indexDir: String,
                           qPred: org.apache.spark.sql.Column = HybridIndex.DefaultQPred,
                           k: Int = 10, sampleEvery: Long = 0L): (Long, Long) = {
    import spark.implicits._
    val nBase = HybridIndex.committedBase(spark, indexDir).count()
    val rate = if (sampleEvery == 0L) sampleEveryFor(nBase) else sampleEvery
    val (_, rec) = HybridIndex.denseRecallMicro(spark, indexDir, qPred, k, rate)
    val (_, qerr) = HybridIndex.quantErrMean(spark, indexDir,
      HybridIndex.healthSamplePred(rate))
    Seq((rec, qerr, k.toLong, rate, nBase, SampleFloor))
      .toDF("baseline_recall_micro", "baseline_quant_err", "k", "sample_every",
        "n_base", "sample_floor")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/health.parquet")
    (rec, qerr)
  }

  /** Persist the BUILD corpus's drift-reference histogram (b, cr) into
    * the index — the companion of [[recordHealthBaseline]], written
    * once after build so the STANDING monitor ([[decideOnline]]) can
    * compare admitted batches against the build mixture without ever
    * re-scanning the build corpus. B-bounded (≤ 8192 rows). */
  def recordDriftReference(spark: SparkSession, indexDir: String,
                           ref: DataFrame): Unit =
    DsirSelect.featureRows(ref, targetSource = "")
      .groupBy("b").agg(count(lit(1)).as("cr"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/drift_ref.parquet")

  /** The STANDING decision: the drift leg reads the per-source
    * histograms an online monitor already maintains
    * ([[graft.streaming.DriftStream.modelFromCheckpoint]]'s shape:
    * source → bucket → count) instead of re-scanning the admitted
    * corpus — the admitted batches were featurized once, as they
    * arrived — and compares them against the [[recordDriftReference]]
    * histogram persisted in the index; the index-health legs are
    * [[decide]]'s, verbatim. [[graft.RetrainTriggerSpec]] pins
    * decideOnline == decide row-for-row when the model holds exactly
    * the admitted documents. */
  def decideOnline(spark: SparkSession, indexDir: String,
                   model: Map[String, Map[Long, Long]],
                   qPred: org.apache.spark.sql.Column = HybridIndex.DefaultQPred,
                   k: Int = 10): DataFrame = {
    import spark.implicits._
    val refHist = spark.read.parquet(s"$indexDir/drift_ref.parquet")
    val curHist = model.toSeq
      .flatMap { case (src, h) => h.toSeq.map { case (b, c) => (src, b, c) } }
      .toDF("source", "b", "cs")
    driftFromHists(refHist, curHist)
      .select(col("source").as("scope"), lit("drift_l1").as("metric"),
        col("l1_micro").as("value_micro"))
      .withColumn("decision",
        when(col("value_micro") > L1ThresholdMicro, "retrain").otherwise("keep"))
      .unionByName(indexHealthRows(spark, indexDir, qPred, k))
  }

  /** The two `__index` verdict rows shared by [[decide]] and
    * [[decideOnline]]. The health-sample rate rides in the persisted
    * baseline ([[recordHealthBaseline]]): the epoch measurement
    * replays the rule the baseline was recorded under, by
    * construction. */
  private def indexHealthRows(spark: SparkSession, indexDir: String,
                              qPred: org.apache.spark.sql.Column,
                              k: Int): DataFrame = {
    import spark.implicits._
    val hdf = spark.read.parquet(s"$indexDir/health.parquet")
    val h = hdf.head
    val (baseRec, baseErr) = (h.getLong(0), h.getLong(1))
    // Pre-round-12 baselines carry no rate column: they were full scans.
    val sampleEvery =
      if (hdf.columns.contains("sample_every")) h.getAs[Long]("sample_every") else 1L
    val (_, recallMicro) =
      HybridIndex.denseRecallMicro(spark, indexDir, qPred, k, sampleEvery)
    val (_, errNow) = HybridIndex.quantErrMean(spark, indexDir,
      HybridIndex.healthSamplePred(sampleEvery))
    val recKeep = recallMicro * 1000000L >= baseRec * RecallKeepFractionMicro
    // Double-domain compare: error means can reach ~1e16 on
    // high-magnitude corpora, where ×10⁶ would overflow Long; the
    // index verdicts are spec-pinned, not hash-oracled, so the float
    // ratio is safe here (and exact at any sane magnitude).
    val errKeep = errNow.toDouble * 1000000.0 <= baseErr.toDouble * QuantErrGrowthMicro
    Seq(("__index", "quant_err", errNow, if (errKeep) "keep" else "retrain"),
        ("__index", "dense_recall", recallMicro, if (recKeep) "keep" else "retrain"))
      .toDF("scope", "metric", "value_micro", "decision")
  }

  /** Per-source drift of `cur` against the `ref` mixture:
    * (source, n_feats, l1_micro). Both inputs need (doc_id, source,
    * text); ref's sources are ignored (it is ONE reference mixture).
    * Two feature passes — [[driftSplit]] is the one-pass spelling for
    * the common case where ref and cur partition ONE table. */
  def driftVsRef(ref: DataFrame, cur: DataFrame): DataFrame = {
    val rf = DsirSelect.featureRows(ref, targetSource = "")
    val cf = DsirSelect.featureRows(cur, targetSource = "")
    // Both histograms are ≤ sources×B rows BY CONSTRUCTION — the
    // bounded LocalRelation round-trip (the qx93 pattern), so the
    // grid below joins driver-sized tables, not corpus lineage.
    driftFromHists(
      localized(rf.groupBy("b").agg(count(lit(1)).as("cr"))),
      localized(cf.groupBy("source", "b").agg(count(lit(1)).as("cs"))))
  }

  /** One-pass [[driftVsRef]] over a single table split by `refPred`:
    * the feature kernel scans the corpus ONCE with the ref flag riding
    * each row, and both histograms fold out of one aggregation — at
    * the 100× probe this halves the dominant cost (the two kernel
    * scans) while remaining bit-identical to the two-pass spelling
    * ([[graft.RetrainTriggerSpec]] pins it). The reference rows ride
    * under the reserved source name `__ref` — a corpus source by that
    * name would merge into the reference (none of the fixtures, nor
    * any sane corpus, names a source with a dunder). */
  def driftSplit(docs: DataFrame,
                 refPred: org.apache.spark.sql.Column): DataFrame = {
    val feats = DsirSelect.featureRows(
      docs.withColumn("source",
        when(refPred, lit("__ref")).otherwise(col("source"))),
      targetSource = "")
    val hist = localized(
      feats.groupBy("source", "b").agg(count(lit(1)).as("cs")))
    driftFromHists(
      hist.where(col("source") === "__ref")
        .select(col("b"), col("cs").as("cr")),
      hist.where(col("source") =!= "__ref"))
  }

  /** One-pass FULL + SAMPLED drift (the qx97 shape): ONE feature-kernel
    * scan with the ref flag riding the source column ([[driftSplit]]'s
    * trick) and the pinned sample flag folded into the same
    * aggregation, so BOTH (full, sampled) drift tables derive from one
    * ≤ sources×B histogram — measuring the sampling agreement costs
    * one corpus scan, not two. Zero-count rows are dropped before the
    * grid fold, which makes each leg bit-identical to running
    * [[driftSplit]] on the corresponding corpus slice
    * ([[graft.RetrainTriggerSpec]] pins it): a source with no sampled
    * docs is ABSENT from the sampled table, exactly as a two-pass
    * sampled scan would leave it. */
  def driftSplitSampled(docs: DataFrame, refPred: org.apache.spark.sql.Column,
                        sampPred: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val feats = DsirSelect.featureRows(
      docs.withColumn("source",
        when(refPred, lit("__ref")).otherwise(col("source"))),
      targetSource = "")
    val hist = localized(
      feats.groupBy("source", "b").agg(
        count(lit(1)).as("cs"),
        sum(when(sampPred, 1L).otherwise(0L)).as("css")))
    def leg(cnt: String): DataFrame =
      driftFromHists(
        hist.where(col("source") === "__ref" && col(cnt) > 0)
          .select(col("b"), col(cnt).as("cr")),
        hist.where(col("source") =!= "__ref" && col(cnt) > 0)
          .select(col("source"), col("b"), col(cnt).as("cs")))
    (leg("cs"), leg("css"))
  }

  /** Bounded-histogram round trip (the qx93 LocalRelation pattern). */
  private def localized(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** The shared grid fold: (b, cr) reference histogram × (source, b,
    * cs) per-source histograms → (source, n_feats, l1_micro). Basis
    * per source = ref buckets ∪ that source's buckets: a bucket only
    * the batch emits still contributes |p_src − 0|, and one only the
    * reference emits contributes |0 − p_ref|.
    *
    * Folded DRIVER-SIDE in plain Scala (round-12): both inputs are
    * ≤ sources×B bounded by construction (the LocalRelation class —
    * every caller holds that contract), and spelling the fold as Spark
    * joins paid three join + two aggregation job launches per leg over
    * local data; the 100× probe put qx94 at 5–6 s of which the single
    * corpus scan was a fraction. The arithmetic is bit-identical: floor
    * division on nonnegative counts (`1000000·c div n`), exact Long
    * sums — the gate hashes (qx93/94/97) pin it transitively. */
  private def driftFromHists(refHist: DataFrame, curHist: DataFrame): DataFrame = {
    val spark = refHist.sparkSession
    import spark.implicits._
    val ref: Map[Long, Long] = refHist.collect()
      .map(r => r.getAs[Long]("b") -> r.getAs[Long]("cr")).toMap
    val nr = ref.valuesIterator.sum
    val bySrc = curHist.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("b"), r.getAs[Long]("cs")))
      .groupBy(_._1)
    bySrc.toSeq.map { case (src, rs) =>
      val cs: Map[Long, Long] = rs.map(r => r._2 -> r._3).toMap
      val ns = cs.valuesIterator.sum
      val l1 = (ref.keySet ++ cs.keySet).iterator.map { b =>
        math.abs(1000000L * cs.getOrElse(b, 0L) / ns -
          1000000L * ref.getOrElse(b, 0L) / nr)
      }.sum
      (src, ns, l1)
    }.toDF("source", "n_feats", "l1_micro")
  }

  /** The full decision table for one admission epoch: one row per
    * admitted source (`metric` = drift_l1) plus two `__index` rows
    * (`metric` = quant_err / dense_recall, values in their native
    * units), each carrying its measured value and the pinned-rule
    * verdict (the index verdicts compare against the
    * [[recordHealthBaseline]] baselines persisted in the index).
    * `ref`/`cur` are the build-time and admitted documents (doc_id,
    * source, text); `indexDir` the committed [[HybridIndex]]. */
  def decide(spark: SparkSession, indexDir: String,
             ref: DataFrame, cur: DataFrame,
             qPred: org.apache.spark.sql.Column = HybridIndex.DefaultQPred,
             k: Int = 10): DataFrame =
    driftVsRef(ref, cur)
      .select(col("source").as("scope"), lit("drift_l1").as("metric"),
        col("l1_micro").as("value_micro"))
      .withColumn("decision",
        when(col("value_micro") > L1ThresholdMicro, "retrain").otherwise("keep"))
      .unionByName(indexHealthRows(spark, indexDir, qPred, k))
}
