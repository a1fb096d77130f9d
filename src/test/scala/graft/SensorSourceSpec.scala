package graft

import graft.streaming.SensorSource

/** S1 — the seeded random-walk generator must be deterministic (same seed →
  * identical stream) and statistically shaped like the reference's
  * 65 + N(0,20) start / N(0,0.5) step walk (Q/util/SensorSource.java:48-69).
  */
class SensorSourceSpec extends SparkTestBase {

  test("S1: batch generator is deterministic and walk-shaped") {
    val a = SensorSource.batch(spark, nSensors = 10, nPerSensor = 200, seed = 42L).collect()
    val b = SensorSource.batch(spark, nSensors = 10, nPerSensor = 200, seed = 42L).collect()
    assert(a.length == 2000)
    assert(a.map(e => (e.sensor_id, e.event_id, e.value)).toSeq ==
           b.map(e => (e.sensor_id, e.event_id, e.value)).toSeq)
    // Different seed → different walk.
    val c = SensorSource.batch(spark, nSensors = 10, nPerSensor = 200, seed = 7L).collect()
    assert(a.map(_.value).toSeq != c.map(_.value).toSeq)
    // Steps are small (N(0,0.5)): consecutive deltas stay within 5σ.
    val bySensor = a.groupBy(_.sensor_id).values
    bySensor.foreach { evs =>
      val sorted = evs.sortBy(_.ts_us)
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(math.abs(y.value - x.value) < 2.5)
        case _ => ()
      }
    }
    assert(!a.exists(e => e.value.isNaN || e.value.isInfinite))
  }

  test("S1: gaussian hash stream is roughly standard normal") {
    val xs = (0 until 10000).map(i => SensorSource.gaussian(1L, 3L, i.toLong))
    val mean = xs.sum / xs.size
    val varr = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    assert(math.abs(mean) < 0.05)
    assert(math.abs(varr - 1.0) < 0.1)
  }
}
