package graft

import org.apache.spark.sql.functions._

import graft.operators.GopherRules

/** [[GopherRules]] (the qx84 engine): each published rule fires on the
  * document class it was written for, at its exact integer boundary. */
class GopherRulesSpec extends SparkTestBase {

  private def masks(texts: String*): Seq[Long] = {
    import spark.implicits._
    GopherRules.withRuleColumns(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .orderBy("doc_id").select("mask").collect().map(_.getLong(0)).toSeq
  }

  test("word-count rule (1): 49 words fail, 50 words pass at the boundary") {
    // 'the a' prefix satisfies the stop rule; 'word' keeps mean length in band.
    val pass = ("the a " + Seq.fill(48)("word").mkString(" "))
    val fail = ("the a " + Seq.fill(47)("word").mkString(" "))
    assert(masks(pass, fail) == Seq(0L, 1L))
  }

  test("mean-word-length rule (2): >10 mean fails, in-band passes") {
    val longWords = "the a " + Seq.fill(60)("extraordinarily").mkString(" ")
    val okWords = "the a " + Seq.fill(60)("word").mkString(" ")
    assert(masks(longWords, okWords) == Seq(2L, 0L))
  }

  test("symbol rule (3): >10% '#'/'...' words fail") {
    val base = Seq.fill(40)("word")
    val symbolic = "the a " + (base ++ Seq.fill(8)("##")).mkString(" ")
    assert(masks(symbolic).head == 4L,
      "8/50 symbol words breach the 1-in-10 cap; mean length (3.6) and alpha (84%) stay in band")
    val sparse = "the a " + (base ++ Seq.fill(40)("word") ++ Seq.fill(4)("w#")).mkString(" ")
    assert((masks(sparse).head & 4L) == 0L, "≤10% symbol words is within policy")
  }

  test("alpha rule (4): numeric-heavy docs fail at the 80% boundary") {
    val numeric = "the a " + (Seq.fill(18)("word") ++ Seq.fill(30)("1234")).mkString(" ")
    assert((masks(numeric).head & 8L) == 8L)
    val boundary = "the a " + (Seq.fill(38)("word") ++ Seq.fill(10)("1234")).mkString(" ")
    assert((masks(boundary).head & 8L) == 0L, "exactly 80% alpha passes")
  }

  test("stopword rule (5): fewer than two stopwords fail") {
    val noStops = Seq.fill(50)("word").mkString(" ")
    val oneStop = "the " + Seq.fill(50)("word").mkString(" ")
    val twoStops = "the a " + Seq.fill(50)("word").mkString(" ")
    assert(masks(noStops, oneStop, twoStops).map(_ & 16L) == Seq(16L, 16L, 0L))
  }

  test("qx84 aggregates only over scan + one exchange (map-side combinable)") {
    val plan = graft.queries.ExtQueries.qx84(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"one shuffle for the 100-group aggregate, nothing else:\n$plan")
  }
}
