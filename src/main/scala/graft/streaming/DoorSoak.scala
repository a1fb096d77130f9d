package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.BloomFilter

/** RocksDB SOAK of the composed ingest door (round-8 verdict #7): the
  * specs run the door at sf0.001 waves; this main pushes 10×–100×
  * document waves through all three checkpointed stages under the
  * RocksDB state store and RECORDS, per stage per wave, Spark's own
  * state-operator metrics — rows in state, state memory, RocksDB SST
  * size, and commit latency — so the 100 TB state posture is measured,
  * not asserted. Results land in SURVEY §8.2 next to the door row.
  *
  * Usage: runMain graft.streaming.DoorSoak [sfDir] [waves]
  * (default /root/testdata/sf0.01 — 10× the spec corpus — in 8 waves.)
  */
object DoorSoak {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("crawl")) { crawlMain(args.drop(1)); return }
    if (args.headOption.contains("index")) { indexMain(args.drop(1)); return }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nWaves = args.lift(1).map(_.toInt).getOrElse(8)
    // probe-scale runs (round 17, r16 verdict #5): cap the corpus read
    // from a larger table (0 = all) — the 200k ingest-door probe rides
    // the 500k graph-probe corpus
    val maxDocs = args.lift(2).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-door-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import IngestDoor.DoorDoc

    val base = Files.createTempDirectory("graft_door_soak").toString
    val allDocs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (if (maxDocs > 0L)
        allDocs.where(org.apache.spark.sql.functions.col("doc_id") < maxDocs)
      else allDocs)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._1)
    println(s"[soak] ${docs.size} docs from $sfDir; door at $base")

    val evalDocs = docs.collect { case (id, _, _) if id % 25 == 0 => id }.toSet
    val evalWins = docs.filter(d => evalDocs.contains(d._1))
      .flatMap(d => DeconStream.windowHashes(d._3)).toSet
    // Bloom image sized to the eval window set (~16 bits/element, so
    // the prescreen keeps pruning at probe scale instead of
    // saturating; 1024 words = the spec-scale floor, unchanged there)
    val mWords = math.max(1024, java.lang.Long.highestOneBit(
      math.max(1L, evalWins.size.toLong / 4L)).toInt * 2)
    val d = 3
    val image = new Array[Long](mWords)
    for (s <- evalWins; i <- 0 until d) {
      val bit = BloomFilter.bitOf(s, i, mWords)
      image((bit / 64).toInt) |= 1L << (bit % 64).toInt
    }
    val rest = docs.filterNot(x => evalDocs.contains(x._1))
    val (corpus, live) = rest.splitAt(rest.size / 2)

    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DoorDoc]
    val q1 = IngestDoor.gateStage(input.toDS(), image, d, evalWins, evalDocs,
      s"$base/staged", s"$base/ck1")
    val q2 = IngestDoor.budgetStage(spark, s"$base/staged", s"$base/budget",
      budgetPerLang = 200000L, s"$base/ck2")
    val q3 = IngestDoor.packStage(spark, s"$base/budget", s"$base/packed",
      chunkLen = 256L, seqLen = 1024L, s"$base/ck3")

    def stateLine(tag: String, wave: Int, q: StreamingQuery): Unit = {
      val p = q.lastProgress
      if (p == null) return
      val commitMs = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
      p.stateOperators.foreach { so =>
        val sst = Option(so.customMetrics.get("rocksdbSstFileSize")).map(_.toString).getOrElse("-1")
        val pinned = Option(so.customMetrics.get("rocksdbPinnedBlocksMemoryUsage")).map(_.toString).getOrElse("-1")
        val commitLatency = Option(so.customMetrics.get("rocksdbCommitLatencyMs")).map(_.toString).getOrElse("-1")
        println(s"""{"stage":"$tag","wave":$wave,"op":"${so.operatorName}",""" +
          s""""rows_in_state":${so.numRowsTotal},"state_bytes":${so.memoryUsedBytes},""" +
          s""""sst_bytes":$sst,"pinned_bytes":$pinned,""" +
          s""""rocksdb_commit_ms":$commitLatency,"batch_add_ms":$commitMs}""")
      }
    }

    // corpus backfill = wave 0, then live waves
    input.addData(corpus.map { case (id, lang, t) => DoorDoc(id, lang, t, is_new = false) })
    q1.processAllAvailable()
    stateLine("gate", 0, q1)
    live.grouped(live.size / nWaves + 1).zipWithIndex.foreach { case (wave, i) =>
      val t0 = System.nanoTime()
      input.addData(wave.map { case (id, lang, t) => DoorDoc(id, lang, t, is_new = true) })
      q1.processAllAvailable()
      val t1 = System.nanoTime()
      q2.processAllAvailable()
      val t2 = System.nanoTime()
      q3.processAllAvailable()
      val t3 = System.nanoTime()
      // per-stage wall (round 17, r16 verdict #5: the composed door's
      // probe must attribute the wave cost to its stages, the
      // doorcells artifact discipline)
      println(f"""{"wave":${i + 1},"docs":${wave.size},"wall_sec":${(t3 - t0) / 1e9}%.2f,""" +
        f""""gate_sec":${(t1 - t0) / 1e9}%.2f,"budget_sec":${(t2 - t1) / 1e9}%.2f,""" +
        f""""pack_sec":${(t3 - t2) / 1e9}%.2f}""")
      stateLine("gate", i + 1, q1)
      stateLine("budget", i + 1, q2)
      stateLine("pack", i + 1, q3)
    }
    q1.stop(); q2.stop(); q3.stop()
    val staged = spark.read.schema(IngestDoor.stagedSchema).parquet(s"$base/staged/batch=*").count()
    // heap envelope, the doorcells spelling: completing under this Xmx
    // is the primary evidence, the largest pool peak the footprint
    val heapMaxGb = Runtime.getRuntime.maxMemory / 1e9
    val heapPeakGb = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(_.getPeakUsage.getUsed).max / 1e9
    }
    println(s"""{"stage":"done","admitted":$staged,"bloom_words":$mWords,""" +
      s""""heap_max_gb":${"%.1f".format(heapMaxGb)},""" +
      s""""heap_peak_pool_gb":${"%.1f".format(heapPeakGb)}}""")
    println(s"[soak] done: $staged admitted docs through the door")
    spark.stop()
  }

  /** `runMain graft.streaming.DoorSoak index [sfDir] [waves] [sampleEvery]`
    * — the INDEX door ([[IndexDoor]], r10 verdict #2) soaked at 10× the
    * spec corpus: build the hybrid index on the first 60% of documents,
    * stream the rest through the FileBus → addBatch door in `waves`
    * producer epochs (admission-bounded triggers, one kill/restart
    * midway), then compact + vacuum and SERVE. Records per wave the
    * admission wall time and segment count, then the maintenance and
    * serve times — the build-once/admit-forever posture measured under
    * the same conditions the ingest/crawl soaks use. `sampleEvery`
    * (default 0 = DERIVE from corpus size with
    * [[graft.operators.RetrainTrigger.sampleEveryFor]] — the r12
    * verdict-#7 rule: 1 at gate/probe fixture scale, >1 past
    * 2×SampleFloor committed vectors; pass an explicit rate to pin)
    * records the health baseline under the pinned vec_id sample rule,
    * so the decide stage's quant-err and recall legs measure the
    * sampled sub-corpus — the r11 verdict-#3 epoch-cost knob, measured
    * here at the 100×-class corpus. */
  private def indexMain(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nWaves = args.lift(1).map(_.toInt).getOrElse(8)
    val sampleEvery = args.lift(2).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-index-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col

    val base = Files.createTempDirectory("graft_index_soak").toString
    val idx = s"$base/index"; val bus = s"$base/bus"; val ck = s"$base/ck"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // The cut splits the EMBEDDED doc set (at sf0.1 only a prefix of
    // docs carries embeddings; a cut over all doc ids would leave the
    // live half vector-less).
    val ids = docs.join(raw.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length * 3 / 5)
    var t0 = System.nanoTime()
    graft.operators.HybridIndex.build(spark,
      docs.where(col("doc_id") < cut), raw.where(col("vec_id") < cut), idx)
    println(f"""{"stage":"build","docs":${ids.count(_ < cut)},"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    t0 = System.nanoTime()
    val (baseRec, baseErr) =
      graft.operators.RetrainTrigger.recordHealthBaseline(spark, idx,
        sampleEvery = sampleEvery)
    // resolved rate read back from the baseline (0 = derived by rule)
    val resolvedRate = spark.read.parquet(s"$idx/health.parquet")
      .head.getAs[Long]("sample_every")
    println(f"""{"stage":"health_baseline","recall_micro":$baseRec,"quant_err":$baseErr,"sample_every":$resolvedRate,"sample_arg":$sampleEvery,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")

    val bRows = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") >= cut)
      .join(raw.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select("doc_id", "source", "text", "embedding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getSeq[Float](3)))
      .sortBy(_._1)
    println(s"[soak] index door: ${bRows.length} live docs in $nWaves waves; at $base")
    // arg 4 "graph": soak the COMPOSED graph/community maintenance too
    // (round 13 — GraphIndex under the same door: per-batch regime-
    // deciding graph admission, community refresh + graph vacuum on
    // the compactEvery cadence).
    val withGraph = args.lift(3).contains("graph")
    val gDir = s"$base/graph"
    if (withGraph) {
      t0 = System.nanoTime()
      // the soak runs the CELLS door explicitly (round 16, r15 verdict
      // #1: the occupancy-robust generator is the production
      // recommendation for any standing door, so the kill/restart soak
      // must exercise ITS init/admit/refresh/serve path; the sf-scale
      // corpus sits below GraphIndex.CellsKnee, where `auto` would
      // pick lsh)
      graft.operators.GraphIndex.init(spark, idx, gDir,
        expectedFinal = raw.count(), generator = "cells")
      println(f"""{"stage":"graph_init","generator":"cells","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    def door() = IndexDoor.run(spark, bus, "docs", idx, ck,
      maxOffsetsPerTrigger = Some(math.max(64L, bRows.length.toLong / (2L * nWaves))),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      compactEvery = Some(4), // the standing-door merge policy, soaked
      graphDir = if (withGraph) Some(gDir) else None)
    var q = door()
    bRows.grouped(bRows.length / nWaves + 1).zipWithIndex.foreach { case (wave, i) =>
      t0 = System.nanoTime()
      wave.groupBy(_._1 % 2).foreach { case (p, rs) =>
        graft.sources.FileBus.append(bus, "docs", p.toInt,
          rs.map { case (id, src, t, e) => IndexDoor.encodeDoc(id, src, t, e, id) }.toSeq)
      }
      q.processAllAvailable()
      if (i == nWaves / 2) { q.stop(); q = door() } // kill/restart midway
      // LIVE segments (manifest max-version) — the set the merge policy
      // bounds; on-disk add= dirs linger under vacuum's grace period.
      val mf = new java.io.File(s"$idx/manifest")
      val maxV = mf.listFiles().map(_.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong).max
      val live = spark.read.parquet(s"$idx/manifest/v=$maxV").count()
      println(f"""{"wave":${i + 1},"docs":${wave.size},"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f,"live_segments":$live}""")
      // RELEASE readout on the maintenance cadence (r14, r13 verdict
      // #5): every other wave, the committed corpus's qx117 manifest
      // is evaluated to one verdict line next to the soak numbers —
      // "is this corpus releasable" as a standing readout. Committed
      // MEMBERSHIP comes from the index (the door's admission record);
      // document metadata rides the upstream table the bus was fed
      // from.
      if ((i + 1) % 2 == 0) {
        t0 = System.nanoTime()
        val committedDocs = spark.read.parquet(s"$sfDir/documents.parquet")
          .join(graft.operators.HybridIndex.committedBase(spark, idx)
            .select(col("vec_id").as("doc_id")), "doc_id")
        val (ok, det) = graft.ReleaseGate.evaluateCorpus(spark, committedDocs,
          s"$base/release_stage")
        val kv = det.toSeq.sortBy(_._1)
          .map { case (k2, v2) => s""""$k2":$v2""" }.mkString(",")
        println(f"""{"stage":"release_gate","wave":${i + 1},"releasable":$ok,$kv,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      }
    }
    q.stop()
    t0 = System.nanoTime()
    graft.operators.HybridIndex.compact(spark, idx)
    graft.operators.HybridIndex.vacuum(spark, idx, graceMs = 0L)
    println(f"""{"stage":"compact+vacuum","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    if (withGraph) {
      // the composed pin, run LIVE at soak scale: the door-maintained
      // graph equals a clean rebuild over the committed union (qx110),
      // and a final refresh labels the latest version
      t0 = System.nanoTime()
      graft.operators.GraphIndex.refreshCommunities(spark, idx, gDir)
      println(f"""{"stage":"graph_refresh","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      t0 = System.nanoTime()
      val gBase = graft.operators.HybridIndex.committedBase(spark, idx)
      // the rebuild must replay the asset's PINNED generator (round 16
      // — the soak now runs the cells door, where the LSH spelling
      // would rebuild a different graph and the check reads as a
      // permanent diff): GraphIndex.signUnder, the asset's own signing
      // dispatch, so the check cannot drift from what the door pinned.
      val rebuilt = graft.operators.GraphAnn.knnGraph(gBase,
        graft.operators.EmbeddingLsh.candidatePairs(
          graft.operators.GraphIndex.signUnder(spark, gDir,
            gBase.select("vec_id", "iv"))), 4)
      val doorG = graft.operators.GraphIndex.graph(spark, gDir)
      // the grouping key carries the cosine (rounded as IndexDoorSpec
      // rounds it — r13 advice): an edge present on both sides with a
      // DIVERGENT weight, or duplicated on one side and absent on the
      // other, must count as a diff, not cancel out on bare (u, v)
      def keyed(g: org.apache.spark.sql.DataFrame) = g.select(col("u"), col("v"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(cos * 1e9) AS BIGINT)").as("cos9"))
      val diff = keyed(doorG).unionByName(keyed(rebuilt))
        .groupBy("u", "v", "cos9").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c"))
        .where(col("c") =!= 2L).count()
      println(f"""{"stage":"graph_rebuild_check","edge_diff":$diff,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      // loud, not just recorded (round 16: the first cells soak read
      // edge_diff=2000 because the check itself rebuilt via the wrong
      // generator — a nonzero diff must kill the soak, not pass as a
      // line in the log)
      require(diff == 0L, s"door-maintained graph diverged from rebuild: $diff edges")
      // SERVE comparison (r14, r13 verdict #1): what the persisted
      // asset saves — beam serve from the committed snapshot vs the
      // inline qx109 shape (sign corpus + rebuild graph + serve) on
      // the same queries — plus the asset serve's recall@top1 vs
      // brute, the qx121 number read LIVE off the maintained asset.
      val qs = gBase.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("n2").as("qn2"))
        .localCheckpoint()
      t0 = System.nanoTime()
      val assetBeam = graft.operators.GraphIndex.search(spark, idx, gDir, qs)
        .localCheckpoint()
      val nServed = assetBeam.count()
      val assetSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      import org.apache.spark.sql.functions.{broadcast, expr}
      // the inline twin replays the asset's pinned generator (round 16
      // — the shared meta-driven dispatch, so the twin cannot drift)
      val nInline = graft.operators.GraphIndex.inlineServeTwin(
        spark, gDir, gBase, qs).count()
      val inlineSec = (System.nanoTime() - t0) / 1e9
      require(nServed == nInline,
        s"asset serve row count diverged from the inline build: $nServed vs $nInline")
      val brute1 = gBase.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .withColumn("dot", expr("long_dot(iv, qiv)"))
        .withColumn("cosine", expr(graft.queries.ExtQueries.COSINE))
        .groupBy("qid").agg(expr("element_at(topk_by(cosine, vec_id, 1), 1)").as("t"))
        .select(col("qid"), col("t.id").as("nn"), col("t.score").as("maxc"))
      // top1-vs-top1 (round 16, the GraphProbe advice fix applied here
      // too): only the serve's rk = 1 row may claim the strict hit
      val top1 = assetBeam.where(col("rk") === 1L)
        .select(col("qid"), col("vec_id").as("snn"), col("cosine").as("scos"))
        .join(brute1, "qid").localCheckpoint()
      val hits = top1.where(col("snn") === col("nn")).count()
      // TIE-AWARE quality recall + the ABSOLUTE floor (round 17, r16
      // verdict #1): the strict metric is not floorable across corpus
      // sizes — at soak scale several vectors routinely tie at the
      // exact maximum cosine and the beam may surface a tied id other
      // than the globally smallest (GraphServeQualitySpec pins the
      // sf0.01 4/10 strict reading as exactly that), so a hit here is
      // served-cosine == brute-max-cosine (same expression, same
      // integers — exact equality). THIS metric carries the floor: a
      // real quality collapse now kills the soak the way a nonzero
      // rebuild edge diff does, instead of passing as a log line.
      val qHits = top1.where(col("scos") === col("maxc")).count()
      val nq = qs.count()
      val qMicro = 1000000L * qHits / math.max(1L, nq)
      println(f"""{"stage":"graph_serve","queries":$nq,"asset_sec":$assetSec%.2f,"inline_sec":$inlineSec%.2f,"recall_top1_micro":${1000000L * hits / math.max(1L, nq)},"recall_q_micro":$qMicro,"recall_floor_micro":${graft.operators.GraphAnn.ServeRecallFloorMicro}}""")
      require(qMicro >= graft.operators.GraphAnn.ServeRecallFloorMicro,
        s"asset serving quality collapsed: tie-aware top1 recall $qMicro micro " +
          s"< floor ${graft.operators.GraphAnn.ServeRecallFloorMicro}")
    }
    // The per-epoch maintenance decision over exactly what the door
    // admitted — the RetrainTrigger loop run where it would run in
    // production (and the soak's healthy feed must KEEP everywhere).
    t0 = System.nanoTime()
    val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .join(raw.select(col("vec_id").as("doc_id")), "doc_id")
    val decisions = graft.operators.RetrainTrigger.decide(spark, idx,
      srcDocs.where(col("doc_id") < cut), srcDocs.where(col("doc_id") >= cut))
      .collect()
    val nRetrain = decisions.count(_.getString(3) == "retrain")
    decisions.filter(r => r.getString(0) == "__index").foreach { r =>
      println(s"""{"stage":"decide","metric":"${r.getString(1)}","value":${r.getLong(2)},"decision":"${r.getString(3)}"}""")
    }
    println(f"""{"stage":"decide","rows":${decisions.length},"retrain":$nRetrain,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    require(nRetrain == 0,
      s"healthy soak feed fired the retrain trigger: ${decisions.filter(_.getString(3) == "retrain").toSeq.take(3)}")
    t0 = System.nanoTime()
    val servedRows = graft.operators.HybridIndex.search(spark, idx).count()
    println(f"""{"stage":"serve","rows":$servedRows,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    require(servedRows > 0L, "index soak served zero rows")
    spark.stop()
  }

  /** `runMain graft.streaming.DoorSoak crawl [sfDir] [waves]` — the
    * CRAWL door (r9 verdict #4: politeness ON) under RocksDB: WARC
    * waves through unwrap → frontier → pace → dedup with a 1 s
    * crawl-delay on every domain, per-stage state metrics per wave.
    * The pace stage's token buckets + pending backlog are the state
    * whose growth this soak watches; the final heartbeat drains every
    * pending timer so released == admitted is asserted, not assumed. */
  private def crawlMain(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nWaves = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft_crawl_soak").toString
    val media = graft.queries.ExtQueries.qx77Media(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq.sortBy(_._1)
    println(s"[soak] ${media.size} crawl records from $sfDir; door at $base")
    val robots = (0 until 32).map(i => s"m$i.example" -> "User-agent: *\nCrawl-delay: 1\n").toMap

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders
      .tuple(org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q1 = CrawlDoor.unwrapStage(
      input.toDF().toDF("doc_id", "warc"), robots, "graftbot",
      s"$base/staged", s"$base/ck1")
    val q2 = CrawlDoor.frontierStage(spark, s"$base/staged", s"$base/frontier", s"$base/ck2")
    val qp = CrawlDoor.paceStage(spark, s"$base/frontier", s"$base/paced", s"$base/ckp")
    val q3 = CrawlDoor.dedupStage(spark, s"$base/paced", s"$base/manifest", s"$base/ck3")

    def stateLine(tag: String, wave: Int, q: StreamingQuery): Unit = {
      val p = q.lastProgress
      if (p == null) return
      val commitMs = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
      p.stateOperators.foreach { so =>
        val commitLatency = Option(so.customMetrics.get("rocksdbCommitLatencyMs"))
          .map(_.toString).getOrElse("-1")
        println(s"""{"stage":"$tag","wave":$wave,"op":"${so.operatorName}",""" +
          s""""rows_in_state":${so.numRowsTotal},"state_bytes":${so.memoryUsedBytes},""" +
          s""""rocksdb_commit_ms":$commitLatency,"batch_add_ms":$commitMs}""")
      }
    }

    media.grouped(media.size / nWaves + 1).zipWithIndex.foreach { case (wave, i) =>
      val t0 = System.nanoTime()
      input.addData(wave)
      q1.processAllAvailable(); q2.processAllAvailable()
      qp.processAllAvailable(); q3.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"wave":${i + 1},"records":${wave.size},"wall_sec":$sec%.2f}""")
      stateLine("frontier", i + 1, q2)
      stateLine("pace", i + 1, qp)
      stateLine("dedup", i + 1, q3)
    }
    // Heartbeats drain every pending politeness timer.
    for (i <- 1 to 2) {
      CrawlDoor.writeHeartbeat(spark, s"$base/frontier", i)
      qp.processAllAvailable(); q3.processAllAvailable()
    }
    stateLine("pace", nWaves + 1, qp)
    q1.stop(); q2.stop(); qp.stop(); q3.stop()
    val admitted = spark.read.schema(CrawlDoor.stagedSchema)
      .parquet(s"$base/frontier/batch=*")
      .where(org.apache.spark.sql.functions.col("domain") =!= CrawlDoor.FlushDomain).count()
    val released = spark.read.parquet(s"$base/paced/batch=*").count()
    println(s"[soak] crawl door done: admitted=$admitted released=$released " +
      s"(politeness drained=${admitted == released})")
    // ASSERTED, not just printed (the r10 review): an unattended soak
    // run must fail loudly if the politeness drain regresses.
    require(admitted == released,
      s"politeness drain regression: admitted=$admitted released=$released")
    spark.stop()
  }
}
