package graft

import org.apache.spark.sql.functions._

import graft.operators.HilbertCurve

/** [[HilbertCurve]] (the qx87 engine). The first test proves the CURVE
  * property itself — consecutive indices are unit-adjacent grid points
  * and the map is a bijection — which no engine-vs-engine hash can
  * show (both sides share the stage builder by design). The last
  * measures the reason the operator exists: tighter bucket extents
  * than Z-order on the same projection. */
class HilbertCurveSpec extends SparkTestBase {

  test("the walk IS a Hilbert curve: bijective, consecutive d ⇒ unit step (order 5)") {
    val order = 5
    val n = 1 << order
    val pts = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertCurve.xy2d(order, x, y), x, y)
    assert(pts.map(_._1).distinct.size == n * n, "d is a bijection onto [0, 4^k)")
    assert(pts.map(_._1).min == 0L && pts.map(_._1).max == n * n - 1)
    val walk = pts.sortBy(_._1)
    walk.sliding(2).foreach {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"curve jumps from ($x1,$y1) to ($x2,$y2)")
      case _ =>
    }
  }

  test("staged walk == hilbert2 kernel == Scala reference at full order") {
    import spark.implicits._
    val probe = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (32768L, 17L), (12345L, 54321L), (65535L, 0L), (40000L, 40000L))
    val df = HilbertCurve.withHilbert(probe.toDF("x", "y"), "x", "y", "hv")
      .withColumn("hk", expr("hilbert2(x, y)"))
    val got = df.select("x", "y", "hv", "hk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    probe.foreach { case (x, y) =>
      val want = HilbertCurve.xy2d(HilbertCurve.Order, x, y)
      assert(got((x, y)) == ((want, want)), s"($x,$y)")
    }
  }

  test("scan-local plan: 16 staged projections, zero exchanges before the aggregate") {
    import spark.implicits._
    val df = HilbertCurve.withHilbert(
      Seq((1L, 2L)).toDF("x", "y"), "x", "y", "hv")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"the index is a scan-local column:\n$plan")
  }

  test("measured locality: Hilbert file runs have tighter extents than Z-order") {
    // At power-of-4-ALIGNED bucket widths both curves induce the same
    // hierarchical cells (identical extents — measured, that test would
    // be vacuous). Real file splits are row-count-sized, not aligned,
    // so the witness is UNALIGNED runs: windows of 96 consecutive curve
    // positions over the full order-8 grid, mean bounding-box
    // semi-perimeter. Hilbert's consecutive cells are side-adjacent;
    // Z-order's diagonal seams widen the box (Moon et al. 2001).
    val order = 8
    val n = 1 << order
    def morton(x: Int, y: Int): Long =
      (0 until order).foldLeft(0L)((a, i) =>
        a | (((x >> i) & 1).toLong << (2 * i + 1)) | (((y >> i) & 1).toLong << (2 * i)))
    def meanExtent(index: (Int, Int) => Long): Double = {
      val byD = (for (x <- 0 until n; y <- 0 until n) yield (index(x, y), x, y))
        .sortBy(_._1).toArray
      val runs = byD.grouped(96).filter(_.length == 96).toArray
      runs.map { w =>
        (w.map(_._2).max - w.map(_._2).min) + (w.map(_._3).max - w.map(_._3).min)
      }.sum.toDouble / runs.length
    }
    val h = meanExtent((x, y) => HilbertCurve.xy2d(order, x, y))
    val z = meanExtent((x, y) => morton(x, y))
    info(f"mean 96-row-run semi-perimeter: hilbert $h%.2f vs zorder $z%.2f")
    assert(h < z, s"Hilbert ($h) should beat Z-order ($z) on unaligned run extent")
  }
}
