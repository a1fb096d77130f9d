package graft

import graft.functions.HllEstimate

/** Pins the HLL estimator and merge law over the register geometry the
  * qx73 gate materializes. The gate's ORACLE pins the register GRID
  * under the cross-engine affine key; the float estimate lives here —
  * under a real avalanche mixer (splitmix64, the production xxhash64
  * stand-in), because affine-mod keys have measurably bad deep-tail
  * discrepancy on structured token inputs (3× overestimate at 20k
  * items — the reason qx73's scaladoc sends production estimates
  * through xxhash64 while the oracle pins only the grid). */
class HllSketchSpec extends SparkTestBase {

  /** splitmix64 finalizer: full avalanche, wraps naturally on JVM Long. */
  private def mix(x0: Long): Long = {
    var x = x0 * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** p = 8: low 8 bits → register, high 56 → rho = clz + 1. */
  private def sketch(items: Iterable[Long]): Map[Int, Int] = {
    var regs = Map.empty[Int, Int]
    for (i <- items) {
      val h = mix(i)
      val idx = (h & 255L).toInt
      val w = h >>> 8
      val rho = if (w == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (regs.getOrElse(idx, 0) < rho) regs = regs.updated(idx, rho)
    }
    regs
  }

  test("estimate lands within 3 sigma (~20%) at 20k distinct items") {
    val items = (1L to 20000L)
    val est = HllEstimate.estimate(HllEstimate.toHistogram(sketch(items)))
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"est $est")
  }

  test("small-range linear counting kicks in and is tight") {
    val est = HllEstimate.estimate(HllEstimate.toHistogram(sketch(1L to 60L)))
    assert(math.abs(est - 60.0) < 6.0, s"est $est")
  }

  test("register-wise max merge equals the sketch of the union") {
    val a = (1L to 5000L).map(_ * 31L)
    val b = (4000L to 9000L).map(_ * 17L)
    val merged = HllEstimate.mergeRegisters(sketch(a), sketch(b))
    assert(merged === sketch(a ++ b))
    // merge is insensitive to sharding
    val shards = (a ++ b).grouped(1000).map(sketch).reduce(HllEstimate.mergeRegisters)
    assert(shards === merged)
  }

  test("the gate's affine key yields the exact same grid in plain Scala") {
    // cross-check the qx73 register derivation (the oracle-shared
    // spelling) against an independent implementation
    def gateSketch(whs: Iterable[Long]): Map[Int, Int] = {
      var regs = Map.empty[Int, Int]
      for (wh <- whs) {
        val k = ((wh * 1000003L + 12345L) % 2147483647L) * 16777216L +
          ((wh * 69069L + 54321L) % 2147483647L) % 16777216L
        val idx = (k % 256L).toInt
        val w = k / 256L
        val rho = if (w == 0L) 48 else 48 - java.lang.Long.toBinaryString(w).length
        if (regs.getOrElse(idx, 0) < rho) regs = regs.updated(idx, rho)
      }
      regs
    }
    val whs = (0L until 5000L).map(i => i * 7919L % 1000003L)
    val grid = gateSketch(whs)
    assert(grid.nonEmpty && grid.values.forall(v => v >= 1 && v <= 48))
    // the same multiset of items in any order gives the same grid
    assert(gateSketch(whs.reverse) === grid)
  }
}
