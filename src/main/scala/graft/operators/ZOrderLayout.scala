package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering by Z-order (Morton curve) —
  * the write-side operation behind `OPTIMIZE ZORDER BY (a, b)` in
  * Delta/Iceberg-class lakehouses, built from the codegen'd
  * [[graft.functions.ZOrder2]] interleave.
  *
  * Why it matters at 100 TB: parquet scans prune FILES (and row groups)
  * by min/max statistics. A table sorted by `a` alone answers `a = ?`
  * scans with tight pruning but leaves `b = ?` scans reading everything —
  * every file spans the full `b` range. Interleaving the bits of both
  * dimensions makes curve-contiguous ranges cover small RECTANGLES of
  * the (a, b) grid, so every output file bounds BOTH dimensions and
  * either predicate prunes. The locality is quantifiable (and ZOrderSpec
  * measures it): with n rows in F files, a z-layout bounds each file's
  * per-dim span near √(gridArea / F) while a linear layout leaves the
  * non-leading span at full width.
  *
  * The pipeline is declarative end to end: quantize each dimension to a
  * 16-bit bin (`bin16` — rank-free affine binning against fixed bounds,
  * so it is a pure per-row function, replay-stable, and needs no global
  * pass), interleave ([[zvalue]]), then `repartitionByRange` +
  * `sortWithinPartitions` on the z-value so each output file is one
  * curve segment. Range boundaries come from Spark's reservoir sample —
  * the one nondeterminism, confined to file SIZING (which rows share a
  * file), never file CONTENT ordering or the z-values themselves.
  */
object ZOrderLayout {

  /** Quantize `c` into [0, 65536) by affine scaling from [lo, hi] — the
    * fixed-bounds binning a standing 100 TB table uses so that bins stay
    * comparable across ingest batches (re-binning by per-batch min/max
    * would shift every historical z-value). Values outside [lo, hi]
    * clamp to the edge bins. */
  def bin16(c: Column, lo: Double, hi: Double): Column = {
    require(hi > lo, s"bin16 bounds [$lo, $hi] are empty")
    val t = (c.cast("double") - lit(lo)) / lit(hi - lo)
    least(lit(65535L), greatest(lit(0L), floor(t * lit(65536.0)).cast("long")))
  }

  /** The z-value column: `zorder2(a, b)` over two 16-bit bin columns.
    * Spelled through the SQL registration so SQL users get the same
    * function (`SELECT zorder2(...)`). */
  def zvalue(a: Column, b: Column): Column =
    call_function("zorder2", a, b)

  /** Cluster `df` into `numFiles` curve segments: range-partition by
    * z-value and sort within each partition, so a `.write.parquet` of
    * the result yields files whose min/max bound both dimensions. The
    * z-value rides along as `zcol` for inspection/pruning audits. */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int,
              zcol: String = "z_value"): DataFrame = {
    require(numFiles >= 1, s"numFiles $numFiles must be >= 1")
    df.withColumn(zcol, zvalue(a, b))
      .repartitionByRange(numFiles, col(zcol))
      .sortWithinPartitions(zcol)
  }
}
