package graft

import org.apache.spark.sql.functions._

/** qx116 — community-aware mixing caps. The gate row pins the
  * composition hash over the driver corpus, whose LSH graph floods to
  * 1–2 communities (stated in the row's scaladoc) — so THIS spec
  * plants the structure the operator exists for: a near-duplicate
  * FLOOD community plus two niche communities, and pins the UniMax
  * waterfill semantics (niches keep their full epoch, the flood is
  * held to the uniform leftover share) and the stride schedule's
  * smoothness (a niche's slots spread evenly through the flood's).
  */
class CommunityCapSpec extends SparkTestBase {
  import spark.implicits._

  test("planted flood + niches: niches capped at one epoch, flood held to the leftover share") {
    // community 100 = the flood (10 docs x 1000 tokens), 200/300 niches
    val labels = ((0L until 10L).map(d => (d, 100L)) ++
      Seq((10L, 200L), (11L, 200L), (12L, 300L))).toDF("u", "label")
    val toks = ((0L until 10L).map(d => (d, 1000L)) ++
      Seq((10L, 300L), (11L, 200L), (12L, 100L))).toDF("u", "nt")
    val out = queries.ExtQueries.communityCapAudit(labels, toks).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    // avail: 100 -> 10000, 200 -> 500, 300 -> 100; budget = floor(10600*4/5) = 8480
    // waterfill (cap asc): 300 capped (100), 200 capped (500),
    // 100 uncapped -> share = 8480 - 600 = 7880
    assert(out(300L)._1 === 100L, "tiny niche keeps its full epoch")
    assert(out(200L)._1 === 500L, "small niche keeps its full epoch")
    assert(out(100L)._1 === 7880L, "the flood is held to the uniform leftover share")
    assert(out.values.map(_._1).sum === 8480L, "allocations exhaust the budget exactly")
    // smoothness: the 500-slot niche recurs at most every ~ceil(B/alloc)+1
    // positions — stride scheduling's bounded-gap guarantee
    assert(out(200L)._2 <= 8480L / 500L + 2L,
      s"niche slots must interleave smoothly, max_gap ${out(200L)._2}")
  }

  test("more than 16 communities fold into the -1 tail unit") {
    val labels = (0L until 40L).map(d => (d, d % 20L)).toDF("u", "label")
    val toks = (0L until 40L).map(d => (d, 100L + (d % 20L))).toDF("u", "nt")
    val out = queries.ExtQueries.communityCapAudit(labels, toks)
    val communities = out.select("community").collect().map(_.getLong(0)).toSet
    assert(communities.contains(-1L), "tail unit must exist past 16 communities")
    assert(communities.size <= 17L, "at most 16 named units plus the tail")
  }
}
