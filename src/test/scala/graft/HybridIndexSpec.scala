package graft

import graft.operators.HybridIndex

/** [[HybridIndex]]: the persisted build/serve split must reproduce the
  * monolithic qx79b gate BIT-identically — same trained books, same
  * codes, same BM25 integers, same fused ranks — after a full parquet
  * round-trip of every asset. Transitively this pins the served output
  * against the DuckDB oracle (qx79b is hash-green). */
class HybridIndexSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("build + search from parquet assets == monolithic qx79b") {
    val out = tmpDir("hybrid_idx")
    HybridIndex.build(spark, dir, out)
    val served = HybridIndex.search(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val gate = SparkEntry.queries("qx79b_hybrid_ivfadc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(served.size == gate.size && served == gate,
      s"served output diverged from the monolithic gate: " +
        s"served=${served.size} gate=${gate.size}, " +
        s"diff=${(served.toSet -- gate.toSet).take(3)}")
  }
}
