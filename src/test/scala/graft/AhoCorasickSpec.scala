package graft

import graft.operators.AhoCorasick
import graft.operators.AhoCorasick.{Automaton, DocHits}

/** The automaton against a brute-force reference scan (the oracle's
  * enumerate-every-substring definition, in Scala) — overlapping,
  * nested and shared-suffix matches are the load-bearing cases. */
class AhoCorasickSpec extends SparkTestBase {

  /** The oracle semantics, naively: every (pattern, start) with a
    * substring match counts once. */
  private def naive(patterns: IndexedSeq[String], text: String): DocHits = {
    val occ = for {
      (p, pi) <- patterns.zipWithIndex
      i <- 0 to text.length - p.length
      if text.regionMatches(i, p, 0, p.length)
    } yield (pi, i + 1)
    DocHits(0L, occ.size.toLong, occ.map(_._1).distinct.size.toLong,
      if (occ.isEmpty) 0L else occ.map(_._2).min.toLong,
      occ.map(_._1 + 1L).sum)
  }

  private def check(patterns: IndexedSeq[String], text: String): Unit = {
    val got = new Automaton(patterns).stats(0L, text)
    assert(got == naive(patterns, text), s"mismatch on '$text' / $patterns")
  }

  test("self-overlapping pattern counts every end position") {
    check(IndexedSeq("aa"), "aaaa") // 3 overlapping occurrences
    val h = new Automaton(IndexedSeq("aa")).stats(7L, "aaaa")
    assert(h == DocHits(7L, 3L, 1L, 1L, 3L))
  }

  test("nested suffixes all fire at their shared end") {
    // "scan" ends at 4; the emit chain must also fire "can" and "an".
    val h = new Automaton(IndexedSeq("scan", "can", "an")).stats(1L, "scan")
    assert(h == DocHits(1L, 3L, 3L, 1L, 6L))
    check(IndexedSeq("scan", "can", "an"), "a scan can span an ocean")
  }

  test("cross-word bigram self-overlaps through the shared space") {
    check(IndexedSeq("a a"), "a a a a") // ends at 3,5,7
    val h = new Automaton(IndexedSeq("a a")).stats(0L, "a a a")
    assert(h.n_hits == 2L && h.first_pos == 1L)
  }

  test("failure links across shared stems (brute-force sweep)") {
    val pats = IndexedSeq("table", "able", "le", "part", "art", "a a")
    val rnd = new scala.util.Random(42)
    val vocab = Array("table", "a", "part", "art", "ble", "le", "xy", "tab")
    (1 to 200).foreach { _ =>
      val text = Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
      check(pats, text)
    }
  }

  test("non-ASCII text never aliases into a match") {
    // 'é' (0xE9) masks to 'i' (0x69) under a naive 7-bit fold — the
    // automaton must treat it as a dead class instead.
    val ac = new Automaton(IndexedSeq("in"))
    assert(ac.stats(0L, "én").n_hits == 0L, "aliased match on é→i")
    assert(ac.stats(0L, "in én in").n_hits == 2L)
    // A non-ASCII char breaks a match in progress.
    assert(ac.stats(0L, "ién").n_hits == 0L)
    intercept[IllegalArgumentException](new Automaton(IndexedSeq("café")))
  }

  test("empty and missing texts produce no hits") {
    val ac = new Automaton(IndexedSeq("zz"))
    assert(ac.stats(0L, "") == DocHits(0L, 0L, 0L, 0L, 0L))
    assert(ac.stats(0L, "no match here") == DocHits(0L, 0L, 0L, 0L, 0L))
  }

  test("scanDF emits only hit documents, with exact aggregates") {
    import spark.implicits._
    val docs = Seq((1L, "a scan"), (2L, "zzz"), (3L, "scan scan"))
      .toDF("doc_id", "text")
    val out = AhoCorasick.scanDF(docs, Seq("scan", "can", "an"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 3L -> 6L)) // doc 2 absent
  }

  test("scanDF on a streaming frame equals batch (stateless online twin)") {
    // The scan is stateless, so the online twin IS the batch operator
    // applied per micro-batch — no processor, no state, no replay
    // contract needed beyond the sink's.
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    implicit val enc = Encoders.product[(Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = AhoCorasick.scanDF(
        input.toDS().toDF("doc_id", "text"), AhoCorasick.GateBlocklist)
      .writeStream.format("memory").queryName("bl_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_bl")).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("bl_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = AhoCorasick.scanDF(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .select($"doc_id", $"text"), AhoCorasick.GateBlocklist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }

  test("gate blocklist on the sf0.001 corpus matches the brute force") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect()
    val ac = new Automaton(AhoCorasick.GateBlocklist)
    val got = AhoCorasick.scanDF(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .select($"doc_id", $"text"),
        AhoCorasick.GateBlocklist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.foreach { case (id, text) =>
      val want = naive(AhoCorasick.GateBlocklist, text)
      val w = if (want.n_hits == 0) None
              else Some((want.n_hits, want.n_patterns, want.first_pos, want.hit_sig))
      assert(got.get(id) == w, s"doc $id")
      assert(ac.stats(id, text).copy(doc_id = 0L) == want)
    }
  }
}
