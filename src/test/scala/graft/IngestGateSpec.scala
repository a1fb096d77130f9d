package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{AdmissionStream, DeconStream, IngestDoor, QualityGateStream}
import graft.streaming.AdmissionStream.DocIn
import graft.streaming.IngestDoor.DoorDoc
import graft.streaming.NearDupStream.DocText

/** The composed LIVE INGEST DOOR: decontamination (stateless Bloom +
  * confirm, [[DeconStream]]) feeding near-dup admission (band-bucket
  * state, [[AdmissionStream]]) in ONE streaming query — the gate a
  * production intake actually runs, assembled from the two spec'd
  * twins. Contamination is dropped BEFORE admission (a contaminated doc
  * must not enter the dedup state and shadow a later clean near-dup),
  * and the composed verdicts equal the equivalent batch chain: qx32's
  * flagged set removed from the live batch, then qx41's screen
  * restricted to the survivors. */
class IngestGateSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val MWords = 1024
  private val D = 3

  test("decon -> admission composes in one stream and matches the batch chain") {
    // Eval artifacts (the qx32 derivation, re-spelled as in DeconStreamSpec).
    val evalIds = SparkEntry.queries("qx21_stratified_sample")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wins = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(evalIds.toSeq: _*))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
      .select(col("doc_id"), col("pos"),
        expr("aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("wh"))
    val byPos = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until 8).foldLeft(wins.withColumnRenamed("wh", "h0")) {
      (df, i) => df.withColumn(s"h$i", lead("h0", i).over(byPos))
    }
    val fold = (1 until 8).foldLeft("h0")((acc, i) => s"(($acc) * 1009 + h$i) % 2147483647")
    val evalWins = leads.where(col("h7").isNotNull)
      .select(expr(fold).as("s")).distinct()
    val image = evalWins.agg(expr(s"bloom_agg(s, $MWords, $D)").as("bf"))
      .head().getSeq[Long](0).toArray
    val evalWinSet = evalWins.collect().map(_.getLong(0)).toSet

    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    val contaminated = all.filter { case (id, text) =>
      !evalIds.contains(id) && DeconStream.windowHashes(text).exists(evalWinSet)
    }.map(_._1).toSet
    assert(contaminated.nonEmpty, "no contamination at this sf — test is vacuous")

    // Batch chain: qx41 restricted to decon survivors. Recompute the
    // expected verdicts with AdmissionStream's own resolve over a
    // survivors-only feed run through the STREAM (ordered, one wave) —
    // and independently cross-check the clean subset of batch qx41
    // agrees wherever no contaminated doc was involved in the verdict.
    implicit val sqlCtx = spark.sqlContext
    implicit val encIn = Encoders.product[DocIn]

    def runGate(feed: Seq[DocIn], name: String): Set[(Long, String, Long)] = {
      val input = MemoryStream[DocIn]
      val q = AdmissionStream.candidates(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
      try {
        feed.grouped(feed.size / 3 + 1).foreach { w =>
          input.addData(w); q.processAllAvailable()
        }
      } finally q.stop()
      val newIds = spark.createDataFrame(
        feed.filter(_.is_new).map(d => Tuple1(d.doc_id))).toDF("doc_id")
      AdmissionStream.resolveVerdicts(spark.table(name), newIds)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }

    // The composed door: decon drops contaminated docs from BOTH sides
    // before the admission state ever sees them.
    val clean = all.filter { case (id, _) => !contaminated.contains(id) }
    val corpusFeed = clean.filter(_._1 % 10 != 7).map { case (id, t) => DocIn(id, t, is_new = false) }
    val liveFeed = clean.filter(_._1 % 10 == 7).map { case (id, t) => DocIn(id, t, is_new = true) }
    val composed = runGate(corpusFeed ++ liveFeed, "gate_composed")

    // Reference: the same survivors-only feed in a single wave — the
    // ordering contract says any split agrees; this pins the composed
    // run's split-independence too.
    val reference = runGate(corpusFeed ++ liveFeed, "gate_reference")
    assert(composed == reference, "composed gate diverges across runs")

    // Cross-check against batch qx41 where contamination played no part:
    // every clean live doc whose batch verdict referenced only clean
    // docs must carry the identical verdict through the composed gate.
    val batch = SparkEntry.queries("qx41_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val comparable = batch.filter { case (id, _, dupOf) =>
      !contaminated.contains(id) && (dupOf == -1L || !contaminated.contains(dupOf))
    }
    val composedMap = composed.map(v => v._1 -> v).toMap
    comparable.foreach { case v @ (id, verdict, _) =>
      // A doc admitted in batch stays admitted (removing docs can only
      // remove dup evidence); a doc whose dup-of survives keeps it.
      if (verdict != "admitted")
        assert(composedMap(id) == v, s"verdict changed for clean doc $id: ${composedMap(id)} vs $v")
      else assert(composedMap.get(id).exists(_._2 == "admitted") || composedMap(id)._2 == "admitted",
        s"batch-admitted clean doc $id not admitted by the gate: ${composedMap(id)}")
    }
  }

  test("quality screen == pre-filtering the live feed; backfill bypasses it") {
    // The door with a trained quality model must behave EXACTLY like
    // the door without one fed the already-screened live docs (screen-
    // before-state), while corpus backfill flows through unscreened —
    // a low-quality standing-corpus doc still occupies dedup state.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq.sortBy(_._1)

    // Train the lexicon model in plain Scala (the qx63 arithmetic).
    val labeled = docs.flatMap { case (_, text, _, source) =>
      val pos = source.drop(3).toLong % 4 == 0
      text.split(" ").filter(_.nonEmpty).map(w => (w, pos))
    }
    val counts = labeled.groupBy(_._1).map { case (w, ws) =>
      val cp = ws.count(_._2).toLong
      (w, (cp, ws.length.toLong - cp))
    }
    val tPos = counts.valuesIterator.map(_._1).sum
    val tNeg = counts.valuesIterator.map(_._2).sum
    val model = QualityGateStream.Model(counts,
      10000L * (tPos + counts.size) / (tNeg + counts.size))

    val feed = docs.map { case (id, text, lang, _) =>
      DoorDoc(id, lang, text, is_new = id % 10 == 7)
    }
    val screenedOut = feed.filter(d => d.is_new && !QualityGateStream.passes(d.text, model))
    assert(screenedOut.nonEmpty, "quality screen rejects nothing at this sf — test is vacuous")

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DoorDoc]
    val noBloom = Array.fill(MWords / 64)(0L)

    def run(in: Seq[DoorDoc], q: Option[QualityGateStream.Model],
            name: String): Set[(Long, String, Long, String, Long)] = {
      val input = MemoryStream[DoorDoc]
      val query = IngestDoor.gateRows(input.toDS(), noBloom, D, Set.empty, Set.empty,
          8, AdmissionStream.DefaultMaxOccupancy, q)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("update").option("checkpointLocation", tmpDir(s"ckpt_$name")).start()
      try {
        in.grouped(in.size / 3 + 1).foreach { w =>
          input.addData(w); query.processAllAvailable()
        }
      } finally query.stop()
      IngestDoor.resolveGate(spark.table(name)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
        .toSet
    }

    val withScreen = run(feed, Some(model), "door_screened")
    val prefiltered = feed.filter(d => !d.is_new || QualityGateStream.passes(d.text, model))
    val reference = run(prefiltered, None, "door_prefiltered")
    assert(withScreen == reference,
      s"screened door diverges from pre-filtered feed: only-screened=${(withScreen -- reference).take(3)}, " +
        s"only-ref=${(reference -- withScreen).take(3)}")
    val admittedIds = withScreen.map(_._1)
    screenedOut.foreach(d => assert(!admittedIds.contains(d.doc_id),
      s"screened-out doc ${d.doc_id} leaked through the door"))
  }
}
