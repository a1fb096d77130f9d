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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nWaves = args.lift(1).map(_.toInt).getOrElse(8)
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._1)
    println(s"[soak] ${docs.size} docs from $sfDir; door at $base")

    val evalDocs = docs.collect { case (id, _, _) if id % 25 == 0 => id }.toSet
    val evalWins = docs.filter(d => evalDocs.contains(d._1))
      .flatMap(d => DeconStream.windowHashes(d._3)).toSet
    val mWords = 1024
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
      q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"wave":${i + 1},"docs":${wave.size},"wall_sec":$sec%.2f}""")
      stateLine("gate", i + 1, q1)
      stateLine("budget", i + 1, q2)
      stateLine("pack", i + 1, q3)
    }
    q1.stop(); q2.stop(); q3.stop()
    val staged = spark.read.schema(IngestDoor.stagedSchema).parquet(s"$base/staged/batch=*").count()
    println(s"[soak] done: $staged admitted docs through the door")
    spark.stop()
  }
}
