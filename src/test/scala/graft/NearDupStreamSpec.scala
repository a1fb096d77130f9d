package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SimHashLsh
import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.{DocText, NearDupMatch}

/** Streaming SimHash near-dup ([[NearDupStream]]) — the online qx14:
  * (1) the typed per-doc signature function is bit-identical to the batch
  * `bandSigs` operator on real documents (one shared derivation, two
  * spellings); (2) fed the same corpus through MemoryStream in several
  * micro-batches, the distinct match set equals the batch miner's pairs
  * exactly, regardless of arrival batching; (3) at-least-once re-delivery
  * neither self-pairs nor duplicates state. */
class NearDupStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def corpus(): Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)

  private def bits(n: Int): Int = SimHashLsh.bandWidthFor(n.toLong)

  test("typed docSigs is bit-identical to the batch bandSigs operator") {
    val docs = corpus()
    val w = bits(docs.size)
    // Batch side: the same word-hash explode qx14 feeds the operator.
    val perWord = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .select(col("doc_id"),
        expr("aggregate(split(word, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("x"))
    val batch = SimHashLsh.bandSigs(perWord, w).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((id, text) <- docs; (sig, b) <- NearDupStream.docSigs(text, w).zipWithIndex)
      assert(batch((id, b.toLong)) == sig, s"sig diverges at doc=$id band=$b")
    // Docs with no words produce no batch row but still get a (0,0,0,0)
    // streaming signature — confirm the corpus exercises the joint path.
    assert(batch.size == docs.count(_._2.trim.nonEmpty) * SimHashLsh.Bands)
  }

  test("streamed matches equal the batch miner across micro-batch arrivals") {
    val docs = corpus()
    val w = bits(docs.size)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = NearDupStream.nearDupMatches(input.toDS(), w)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_nds")).start()
    try {
      // Three arrival waves: pairs split across waves must still match.
      docs.grouped(docs.size / 3 + 1).foreach { wave =>
        input.addData(wave.map { case (id, t) => DocText(id, t) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("neardup_stream")
      .select("doc_a", "doc_b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perWord = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .select(col("doc_id"),
        expr("aggregate(split(word, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("x"))
    val batch = SimHashLsh.nearDupPairs(SimHashLsh.bandSigs(perWord, w)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "corpus has no near-dup pairs — test is vacuous")
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("distinctPairs flag: the RAW sink equals the batch miner exactly") {
    // Round-5 verdict #5: with the flag on, the batch-identical DISTINCT
    // pair set must land in the sink itself — no post-pass. Assert on the
    // raw sink rows: no duplicates, and set-equality with the batch miner.
    val docs = corpus()
    val w = bits(docs.size)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = NearDupStream.nearDupMatches(input.toDS(), w, distinctPairs = true)
      .writeStream.format("memory").queryName("neardup_distinct")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_ndd")).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { wave =>
        input.addData(wave.map { case (id, t) => DocText(id, t) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val raw = spark.table("neardup_distinct")
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(raw.size == raw.distinct.size,
      s"duplicate pair reached the raw sink: ${raw.groupBy(identity).filter(_._2.size > 1).keys}")
    val perWord = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .select(col("doc_id"),
        expr("aggregate(split(word, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003)").as("x"))
    val batch = SimHashLsh.nearDupPairs(SimHashLsh.bandSigs(perWord, w)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(raw.toSet == batch,
      s"stream/batch divergence: only-stream=${raw.toSet -- batch}, only-batch=${batch -- raw.toSet}")
  }

  test("at-least-once re-delivery: no self-pairs, no duplicate members") {
    val docs = corpus().take(20)
    val w = bits(docs.size)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val q = NearDupStream.nearDupMatches(input.toDS(), w)
      .writeStream.format("memory").queryName("neardup_redeliver")
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt_ndr")).start()
    try {
      input.addData(docs.map { case (id, t) => DocText(id, t) })
      q.processAllAvailable()
      input.addData(docs.map { case (id, t) => DocText(id, t) }) // replay all
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("neardup_redeliver").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b }, "self-pair emitted on replay")
    // A duplicated member would re-emit its pairs on replay: the full
    // (non-distinct) emission count must not exceed bands per pair.
    val byPair = rows.groupBy(identity).view.mapValues(_.size)
    assert(byPair.forall(_._2 <= SimHashLsh.Bands),
      s"pair emitted more often than once per band: ${byPair.filter(_._2 > SimHashLsh.Bands)}")
  }

  test("occupancy cap bounds per-arrival work under a boilerplate feed") {
    // Round-6 verdict #2: 20 byte-identical docs (one boilerplate
    // template — the streaming analogue of qx17's license-phrase hazard)
    // all land in the SAME four band buckets. With maxOccupancy = 4 each
    // bucket retains 4 exemplars; every later arrival verifies against
    // exactly those 4 (bounded work) instead of an ever-growing list.
    // The distinct pair count is then order-independent: the first wave
    // of 5 emits C(5,2) = 10 (the 5th doc still matches the 4 stored),
    // and each of the 15 later docs emits exactly 4 — 70 total, vs 190
    // uncapped. The skipped appends land in the overflow ValueState:
    // (20 − 4) per bucket × 4 buckets = 64, read back via the statestore
    // source (the F11 pattern).
    val template = "all rights reserved redistribution and use in source and binary forms"
    val all = (1L to 20L).map(id => DocText(id, template))
    val w = bits(all.size)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocText]
    val input = MemoryStream[DocText]
    val ckpt = tmpDir("ckpt_ndcap")
    val q = NearDupStream.nearDupMatches(input.toDS(), w, maxOccupancy = 4)
      .writeStream.format("memory").queryName("neardup_capped")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      all.grouped(5).foreach { wave => input.addData(wave); q.processAllAvailable() }
    } finally q.stop()
    val pairs = spark.table("neardup_capped")
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 70, s"expected 70 capped pairs, got ${pairs.size}")
    val overflow = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "overflow").load()
      .selectExpr("value.value AS n").collect().map(_.getLong(0)).sum
    assert(overflow == 64L, s"expected 64 skipped appends, got $overflow")
  }
}
