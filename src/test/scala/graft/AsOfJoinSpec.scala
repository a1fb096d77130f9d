package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** The shuffled as-of fallback must be indistinguishable from the
  * broadcast path: same rows on random interleavings with timestamp ties,
  * empty buckets (carry-in), and events preceding the first control.
  */
class AsOfJoinSpec extends SparkTestBase {

  private val gen = for {
    nEv <- Gen.choose(20, 120)
    nCt <- Gen.choose(0, 25)
    evs <- Gen.listOfN(nEv, Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0, 999)))
    cts <- Gen.listOfN(nCt, Gen.zip(Gen.choose(0L, 5000L), Gen.oneOf("HIGH", "LOW")))
  } yield (evs, cts)

  test("shuffled fallback == broadcast path on random interleavings") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val (evs, cts) = gen.pureApply(Gen.Parameters.default, Seed(7L + trial))
      val events = evs.zipWithIndex
        .map { case ((ts, v), i) => (i.toLong, ts, v) }.toDF("event_id", "ts", "v")
      val control = cts.toDF("ts", "level")
      val a = AsOfJoin.latestAtOrBefore(events, control, "ts")
        .select("event_id", "ts", "v", "level").collect().map(_.toSeq).toSet
      // Width 700 over the 0..5000 domain: ~8 buckets, some empty, some
      // multi-control — every code path (in-bucket, carry, pre-first-drop).
      val b = AsOfJoin.latestAtOrBeforeShuffled(events, control, "ts", bucketWidth = 700L)
        .select("event_id", "ts", "v", "level").collect().map(_.toSeq).toSet
      assert(a == b, s"trial $trial: paths diverge")
    }
  }

  test("over-ceiling control auto-routes to the shuffled path, same result") {
    import spark.implicits._
    val events = (0L until 200L).map(i => (i, i * 37 % 3000)).toDF("event_id", "ts")
    val control = (0L until 50L).map(i => (i * 61 % 3000, s"c$i")).toDF("ts", "tag")
    val viaBroadcast = AsOfJoin.latestAtOrBefore(events, control, "ts")
      .collect().map(_.toSeq).toSet
    // Ceiling of 10 forces the auto-route (50 > 10) — results must match.
    val viaRoute = AsOfJoin.latestAtOrBefore(events, control, "ts", maxControlRows = 10L)
      .collect().map(_.toSeq).toSet
    assert(viaBroadcast == viaRoute)
  }
}
