package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcChunker

/** Content-defined chunking ([[CdcChunker]], the qx85 engine): the
  * structural contracts that make CDC the right dedup unit — total
  * coverage, and the LBFS insertion-robustness property that fixed-size
  * blocking cannot have (every boundary whose window lies outside an
  * edit survives the edit). */
class CdcChunkerSpec extends SparkTestBase {

  /** Deterministic pseudo-text: seeded word soup, long enough to carry
    * many boundaries (expected chunk ≈ 64 chars). */
  private def soup(seed: Long, words: Int): String = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima")
    var h = seed
    (0 until words).map { _ =>
      h = (h * 6364136223846793005L + 1442695040888963407L)
      vocab(((h >>> 33) % vocab.size).toInt)
    }.mkString(" ")
  }

  private def chunkRows(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    CdcChunker.chunks(texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text")))
      .select("doc_id", "start", "len", "ch1", "ch2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("chunks cover the text exactly: contiguous, total, in order") {
    val text = soup(7, 400)
    val rows = chunkRows(Seq((1L, text))).sortBy(_._2)
    assert(rows.nonEmpty)
    assert(rows.head._2 == 1L, "first chunk starts at position 1")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 == a._2 + a._3, "chunks are contiguous")
      case _           =>
    }
    assert(rows.map(_._3).sum == text.length, "chunk lengths sum to the text")
    assert(rows.length > 3, s"text of ${text.length} chars should carry several boundaries")
  }

  test("insertion robustness: a prefix edit leaves all later chunks intact") {
    val text = soup(11, 400)
    val edited = "zz inserted preamble zz " + text
    val base = chunkRows(Seq((1L, text)))
    val edit = chunkRows(Seq((1L, edited)))
    // Identity = (len, ch1, ch2). Every base chunk AFTER the first
    // boundary has its window fully inside the unchanged suffix, so it
    // must reappear verbatim; only the first chunk may differ.
    val baseIds = base.sortBy(_._2).map(r => (r._3, r._4, r._5))
    val editIds = edit.map(r => (r._3, r._4, r._5)).toSet
    val surviving = baseIds.drop(1).count(editIds.contains)
    assert(surviving == baseIds.length - 1,
      s"all ${baseIds.length - 1} post-boundary chunks must survive the edit; got $surviving")
  }

  test("a fixed-size blocker would lose alignment on the same edit (the contrast)") {
    // Not an implementation test — the documented reason CDC exists.
    // 64-char fixed blocks of text vs prefix+text share (almost) nothing.
    val text = soup(13, 400)
    val blocks = text.grouped(64).toSet
    val shifted = ("zz inserted preamble zz " + text).grouped(64).toSet
    assert((blocks & shifted).size <= 1, "fixed blocking loses alignment after a shift")
  }

  test("the chunk table is scan-local: no exchange below the explode") {
    import spark.implicits._
    val df = CdcChunker.chunks(Seq((1L, soup(17, 100))).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("expected chunk length tracks the 1-in-64 residue (sanity of the mask)") {
    val text = soup(19, 4000)
    val rows = chunkRows(Seq((1L, text)))
    val mean = rows.map(_._3).sum.toDouble / rows.length
    // Geometric with p = 1/64 over positions ⇒ mean ≈ 64; generous band.
    assert(mean > 24 && mean < 200, s"mean chunk length $mean out of band")
  }
}
