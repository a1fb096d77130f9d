package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert space-filling-curve index — the locality-optimal member of
  * the layout family next to [[graft.functions.ZOrder]] (qx53/qx78):
  * sorting by Hilbert index clusters 2-D-close rows into the same file
  * the way Z-order does, but without Z-order's long diagonal jumps —
  * measured better bucket extents on the same data (Moon et al., IEEE
  * TKDE 2001, is the published analysis; [[HilbertCurveSpec]] measures
  * it on this corpus). The production use is identical to qx53: ORDER
  * BY the index before writing, so min/max file statistics prune 2-D
  * range predicates.
  *
  * The index is computed by the classic bit-interleave walk (Warren,
  * Hacker's Delight §16 formulation): for each bit plane s from high to
  * low, the quadrant (rx, ry) contributes s²·((3·rx) XOR ry) steps and
  * the plane below is rotated/reflected into canonical orientation.
  * That walk is SEQUENTIAL per bit — as one nested expression it would
  * duplicate exponentially — so [[withHilbert]] stages it: one
  * simultaneous (hx, hy, hd) column update per bit plane, 16 codegen'd
  * scan-local projections, zero exchanges. The DuckDB twin is GENERATED
  * from the same per-stage builder ([[stageSelect]]) as 16 chained
  * CTEs — the qx83 no-drift discipline; only the xor/div spellings
  * differ by dialect.
  */
object HilbertCurve {

  /** Bits per dimension (65536×65536 grid → 32-bit index). */
  val Order = 16

  /** Scala reference (spec twin; also the property-test subject at
    * small orders): (x, y) → d on the 2^order grid. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << order
    var x = xIn
    var y = yIn
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** One bit-plane's simultaneous update of (hx, hy, hd), emitted for
    * either dialect. `xor` spells bitwise-xor; `div` spells integer
    * division ("div" in Spark, "//" in DuckDB). rx/ry are re-derived
    * inline (cheap: two div/mod on an attribute). */
  def stageExprs(order: Int, s: Long,
                 xor: (String, String) => String,
                 div: String): (String, String, String) = {
    val n = 1L << order
    val rx = s"((hx $div $s) % 2)"
    val ry = s"((hy $div $s) % 2)"
    val newX = s"CASE WHEN $ry = 1 THEN hx WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END"
    val newY = s"CASE WHEN $ry = 1 THEN hy WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END"
    val newD = s"hd + $s * $s * ${xor(s"(3 * $rx)", ry)}"
    (newX, newY, newD)
  }

  private def planes(order: Int): Seq[Long] =
    (order - 1 to 0 by -1).map(b => 1L << b)

  /** Spark side: df(xCol, yCol, …) → df + `out` = Hilbert index. 16
    * staged simultaneous projections (withColumns evaluates all three
    * from the SAME input row — sequential withColumn would read the
    * already-updated hx inside newY). */
  def withHilbert(df: DataFrame, xCol: String, yCol: String,
                  out: String, order: Int = Order): DataFrame = {
    val init = df
      .withColumn("hx", col(xCol).cast("long"))
      .withColumn("hy", col(yCol).cast("long"))
      .withColumn("hd", lit(0L))
    val folded = planes(order).foldLeft(init) { (acc, s) =>
      val (nx, ny, nd) = stageExprs(order, s, (a, b) => s"($a ^ $b)", "div")
      acc.withColumns(Map("hx" -> expr(nx), "hy" -> expr(ny), "hd" -> expr(nd)))
    }
    folded.withColumn(out, col("hd")).drop("hx", "hy", "hd")
  }

  /** DuckDB side: chained CTEs `<prefix>0..<prefix>N` walking the same
    * planes over a source CTE/relation that provides (hx, hy, hd) plus
    * `carry` columns; returns (sqlCtes, finalName). */
  def sqlStages(order: Int, src: String, carry: Seq[String],
                prefix: String = "h"): (String, String) = {
    val carrySel = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val ctes = planes(order).zipWithIndex.map { case (s, i) =>
      val (nx, ny, nd) = stageExprs(order, s, (a, b) => s"xor($a, $b)", "//")
      val from = if (i == 0) src else s"$prefix${i - 1}"
      s"$prefix$i AS (SELECT $carrySel($nx) AS hx, ($ny) AS hy, ($nd) AS hd FROM $from)"
    }
    (ctes.mkString(",\n"), s"$prefix${planes(order).size - 1}")
  }
}
