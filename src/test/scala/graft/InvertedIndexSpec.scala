package graft

import graft.operators.InvertedIndex

/** [[InvertedIndex]] (the qx86 engine): the delta-gap codes, the varint
  * accounting at its byte boundaries, and the hand-checked posting walk. */
class InvertedIndexSpec extends SparkTestBase {

  private def build(docs: (Long, String)*): Map[String, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    InvertedIndex.build(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("hand-checked postings: df/cf/gaps/checksum/varint") {
    val idx = build((0L, "a b a"), (5L, "b"), (9L, "b a"))
    // term a: ds=[0,9] → gaps=[1,9]; checksum=((0*1009+1)*1009+9)%P=1018
    //         varint: 1 byte each → 2.  cf: tf(0)=2, tf(9)=1 → 3.
    assert(idx("a") == ((2L, 3L, 0L, 1018L, 2L)))
    // term b: ds=[0,5,9] → gaps=[1,5,4]; ((1*1009+5)*1009+4)=1023130
    assert(idx("b") == ((3L, 3L, 0L, 1023130L, 3L)))
  }

  test("varint sizing crosses the 7-bit boundary exactly at gap 128") {
    // gap(first) = doc_id + 1: doc 126 → gap 127 (1 byte); doc 127 → 128 (2).
    val one = build((126L, "x"))
    val two = build((127L, "x"))
    assert(one("x")._5 == 1L, "gap 127 encodes in one varint byte")
    assert(two("x")._5 == 2L, "gap 128 needs two varint bytes")
  }

  test("segment-and-merge equals the single-list encoding exactly") {
    import spark.implicits._
    // Doc ids chosen so segment boundaries (segDocs = 8) fall inside,
    // between, and after posting runs: terms span 1..5 segments, one
    // term lives entirely in a late segment, one has a segment-straddle
    // gap of exactly 128 (the 2-varint-byte boundary crossing a merge
    // boundary), and one appears once per segment (the stop-word shape).
    val docs = (0L until 64L).map { d =>
      val terms = Seq(
        Some("stop"),                           // every doc: df = n
        if (d % 7 == 0) Some("seven") else None,
        if (d == 3) Some("straddle") else None,
        if (d >= 48) Some("late") else None,
        if (d < 8) Some("early early") else None).flatten
      (d, terms.mkString(" "))
    } :+ (131L, "straddle") :+ (200L, "sparse") :+ (72L, "sparse straddle2") :+ (200L, "straddle2")
    val df = docs.toDF("doc_id", "text")
    val single = InvertedIndex.build(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (segDocs <- Seq(1L, 8L, 64L, 1000000L)) {
      val seg = InvertedIndex.buildSegmented(df, segDocs).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(seg == single, s"segDocs=$segDocs diverged from the single-list build")
    }
  }

  test("gaps reconstruct the posting list (delta code is invertible)") {
    val docs = Seq(3L, 17L, 18L, 400L, 100000L)
    val idx = build(docs.map(d => (d, "t")): _*)
    assert(idx("t")._1 == docs.length, "df")
    assert(idx("t")._3 == 3L, "first_doc")
    // Replay the checksum from the known gaps in plain Scala.
    val gaps = (docs.head + 1) +: docs.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    val ck = gaps.foldLeft(0L)((a, g) => (a * 1009 + g) % 2147483647L)
    assert(idx("t")._4 == ck, "order-sensitive checksum matches the Scala replay")
  }
}
