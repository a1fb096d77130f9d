package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrderLayout

/** The Z-order layout family: the codegen'd Morton interleave
  * (`zorder2`), the fixed-bounds binning, and the claim that justifies
  * the operator at 100 TB — curve segments bound BOTH dimensions, so
  * file-level min/max stats prune on either predicate.
  */
class ZOrderSpec extends SparkTestBase {

  /** Reference bit-loop — deliberately the naive spelling, not the
    * mask-shift spread the expression uses. */
  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    z
  }

  test("zorder2 matches the bit-loop reference, masks high bits, propagates null") {
    val rows = spark.range(0, 2000)
      .selectExpr("CAST(hash(id) AS BIGINT) & 65535 AS a",
        "CAST(hash(id, 7) AS BIGINT) & 65535 AS b")
      .selectExpr("a", "b", "zorder2(a, b) AS z")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1)),
        s"interleave wrong for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // Edges + masking: bits above the low 16 are ignored.
    val edge = spark.sql(
      "SELECT zorder2(0L, 0L), zorder2(65535L, 65535L), zorder2(65535L, 0L), " +
        "zorder2(65536L, 131073L), zorder2(NULL, 1L)").head
    assert(edge.getLong(0) == 0L)
    assert(edge.getLong(1) == 0xffffffffL)
    assert(edge.getLong(2) == 0xaaaaaaaaL) // a occupies the odd bits
    assert(edge.getLong(3) == refZ(0L, 1L)) // 65536 masks to 0, 131073 to 1
    assert(edge.isNullAt(4))
  }

  /** Stride-k bit-loop reference for [[graft.functions.ZOrderN]]. */
  private def refZN(dims: Seq[Long]): Long = {
    val k = dims.size
    var z = 0L
    for (i <- 0 until 16; d <- 0 until k)
      z |= ((dims(d) >> i) & 1L) << (i * k + (k - 1 - d))
    z
  }

  test("zordern matches the bit-loop reference at k=2,3,4; k=2 equals zorder2; null propagates") {
    val rows = spark.range(0, 2000)
      .selectExpr("CAST(hash(id) AS BIGINT) & 65535 AS a",
        "CAST(hash(id, 7) AS BIGINT) & 65535 AS b",
        "CAST(hash(id, 13) AS BIGINT) & 65535 AS c",
        "CAST(hash(id, 29) AS BIGINT) & 65535 AS d")
      .selectExpr("a", "b", "c", "d",
        "zordern(a, b) AS z2", "zordern(a, b, c) AS z3", "zordern(a, b, c, d) AS z4",
        "zorder2(a, b) AS z2ref")
      .collect()
    rows.foreach { r =>
      val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == refZN(Seq(a, b)), s"k=2 diverged at ($a,$b)")
      assert(r.getLong(5) == refZN(Seq(a, b, c)), s"k=3 diverged at ($a,$b,$c)")
      assert(r.getLong(6) == refZN(Seq(a, b, c, d)), s"k=4 diverged at ($a,$b,$c,$d)")
      assert(r.getLong(4) == r.getLong(7), "zordern(a,b) != zorder2(a,b)")
    }
    // high bits masked; null propagates
    val masked = spark.sql(
      "SELECT zordern(65536L + 3L, 2L, 1L), zordern(3L, 2L, 1L), zordern(CAST(NULL AS BIGINT), 2L, 1L)")
      .collect().head
    assert(masked.getLong(0) == masked.getLong(1))
    assert(masked.isNullAt(2))
  }

  test("zorder2 orders as the Z-curve: prefix buckets are rectangles") {
    // Quadrant check: the top bit of z is a's top bit, the next is b's —
    // so z >> 30 enumerates the four quadrants of the (a, b) square in
    // (a-half, b-half) order. This is the property bucketing relies on.
    val q = spark.range(0, 4096)
      .selectExpr("(id * 2654435761L) & 65535 AS a", "(id * 40503L) & 65535 AS b")
      .selectExpr("a", "b", "zorder2(a, b) >> 30 AS quad")
      .collect()
    q.foreach { r =>
      val expect = ((r.getLong(0) >> 15) << 1) | (r.getLong(1) >> 15)
      assert(r.getLong(2) == expect, s"quadrant wrong for $r")
    }
  }

  test("zorder2 runs inside WholeStageCodegen") {
    val df = spark.range(0, 10).selectExpr("zorder2(id, id + 1L) AS z")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("zorder2") && l.trim.startsWith("*(")))
    df.collect() // doGenCode compiles
  }

  test("bin16 clamps and bins affinely against fixed bounds") {
    val r = spark.range(0, 1).select(
      ZOrderLayout.bin16(lit(-5.0), 0.0, 100.0).as("lo"),
      ZOrderLayout.bin16(lit(250.0), 0.0, 100.0).as("hi"),
      ZOrderLayout.bin16(lit(50.0), 0.0, 100.0).as("mid"),
      ZOrderLayout.bin16(lit(100.0), 0.0, 100.0).as("edge")).head
    assert(r.getLong(0) == 0L && r.getLong(1) == 65535L)
    assert(r.getLong(2) == 32768L)
    assert(r.getLong(3) == 65535L) // hi bound clamps into the top bin
  }

  test("z-order layout bounds BOTH dims per file; linear sort bounds only one") {
    // 64k rows over a 256x256 grid (a, b independent), clustered into 64
    // "files" (partitions). Witness: per-file span of the NON-leading
    // dimension. A linear sort by a leaves each file spanning ~the full b
    // range (no pruning possible on b); the z-layout bounds both spans
    // near the sqrt(gridArea / files) rectangle, so predicates on EITHER
    // dim skip most files.
    val df = spark.range(0, 65536)
      .selectExpr("(id * 2654435761L) & 255 AS a", "(id * 48271L) & 255 AS b")
    def meanSpan(clustered: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val spans = clustered
        .select(spark_partition_id().as("f"), col(dim))
        .groupBy("f").agg((max(dim) - min(dim)).as("span"))
        .agg(avg("span")).head.getDouble(0)
      spans
    }
    val zed = ZOrderLayout.cluster(df, col("a"), col("b"), numFiles = 64).cache()
    val linear = df.repartitionByRange(64, col("a")).sortWithinPartitions("a").cache()
    try {
      val zSpanB = meanSpan(zed, "b")
      val linSpanB = meanSpan(linear, "b")
      val zSpanA = meanSpan(zed, "a")
      info(f"mean per-file b-span: z-order $zSpanB%.1f vs linear-by-a $linSpanB%.1f; z a-span $zSpanA%.1f")
      // Linear layout: b is unconstrained per file (~255). Z-layout: a
      // 64-file split of a 256x256 grid should bound both dims well under
      // half the grid — generous thresholds so reservoir sampling noise
      // in the range boundaries can't flake the suite.
      assert(linSpanB > 150.0, s"linear layout unexpectedly bounded b ($linSpanB)")
      assert(zSpanB < 128.0, s"z-layout failed to bound b ($zSpanB)")
      assert(zSpanA < 128.0, s"z-layout failed to bound a ($zSpanA)")
      assert(linSpanB > 4.0 * zSpanB,
        s"z-layout's b-span ($zSpanB) is not meaningfully tighter than linear ($linSpanB)")
    } finally { zed.unpersist(); linear.unpersist() }
  }
}
