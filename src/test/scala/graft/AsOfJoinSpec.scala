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

  test("90%-skewed timestamps: hot bucket sub-splits, partitions balance, same result") {
    import spark.implicits._
    // 90% of 20k events land in one narrow 100-tick range (one bucket at
    // width 1000); 10% spread over the full 0..10000 domain. Controls are
    // uniform so every sub-bucket path (in-unit control, carry-in from an
    // earlier sub-bucket of the SAME bucket, carry across buckets) fires.
    val events = (0L until 20000L).map { i =>
      val ts = if (i % 10 != 0) 4000L + i % 100 else (i * 97) % 10000
      (i, ts)
    }.toDF("event_id", "ts")
    val control = (0L until 40L).map(i => (i * 251 % 10000, s"c$i")).toDF("ts", "tag")
    val oracle = AsOfJoin.latestAtOrBefore(events, control, "ts")
      .collect().map(_.toSeq).toSet
    // skewTarget 1000: the ~18k-row hot bucket must split into ~18 sub-units.
    val skewed = AsOfJoin.latestAtOrBeforeShuffled(events, control, "ts",
      bucketWidth = 1000L, skewTarget = 1000L)
    assert(skewed.collect().map(_.toSeq).toSet == oracle, "skew-split changes results")
    // Balance proof: no window unit holds more than ~2x the skew target
    // (the hot range is 100 distinct ts over 18 sub-units, so ties cap
    // granularity; without the split one unit would hold ~18k rows).
    val unitCounts = events
      .withColumn("__bucket", expr("ts div 1000L"))
      .groupBy("__bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(unitCounts(4L) > 15000L, "test setup: bucket 4 must be hot")
    val perUnit = AsOfJoin.skewUnitHistogram(events, "ts", 1000L, 1000L)
      .collect().map(_.getLong(1))
    assert(perUnit.max <= 2200L,
      s"sub-split failed to balance: max unit ${perUnit.max} rows")
    // Disabled detection keeps the old single-unit behavior.
    val off = AsOfJoin.latestAtOrBeforeShuffled(events, control, "ts",
      bucketWidth = 1000L, skewTarget = 0L)
    assert(off.collect().map(_.toSeq).toSet == oracle)
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
