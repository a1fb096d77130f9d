package graft

import org.apache.spark.sql.functions._

import graft.operators.Partitioning

/** Rendezvous (HRW) sharding — the minimal-movement placement
  * contract behind qx82, asserted directly rather than through the
  * hash: resizing 8 → 9 relocates ONLY documents the new shard wins,
  * at roughly the expected 1/9 fraction, and placement is stable for
  * everything else. */
class RendezvousShardSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("every mover lands on the new shard; non-movers keep their shard") {
    val rows = graft.queries.ExtQueries.qx82(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s8, s9, moved) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert((s8 != s9) == (moved == 1L))
      if (moved == 1L) assert(s9 == 8L, s"mover ${r.getLong(0)} must land on the NEW shard, went $s9")
    }
  }

  test("movement fraction is ~1/9 and shards are roughly balanced") {
    val df = graft.queries.ExtQueries.qx82(spark, dir)
    val n = df.count().toDouble
    val movedFrac = df.where(col("moved") === 1L).count() / n
    assert(movedFrac > 0.05 && movedFrac < 0.18, s"moved fraction $movedFrac far from 1/9")
    val counts = df.groupBy("shard9").count().collect().map(_.getLong(1))
    assert(counts.length == 9)
    assert(counts.max < 2L * counts.min + 16L,
      s"shard skew too high: ${counts.mkString(",")}")
  }

  test("the shard column drives partitionCustom as one hash exchange") {
    val df = graft.sources.Tables.documents(spark, dir)
      .withColumn("shard", Partitioning.rendezvousShard("doc_id", 8))
    val placed = Partitioning.partitionCustom(df, 8, col("shard"))
    val plan = placed.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1 && plan.contains("hashpartitioning"))
    assert(!plan.contains("Generate"),
      "the argmax must fold into the scan, not explode shard candidates")
  }
}
