package graft

import org.apache.spark.sql.functions._

import graft.operators.EpochShuffle

/** The Feistel epoch-shuffle ([[EpochShuffle]]) — the structural
  * guarantees behind qx83: keys are a PERMUTATION (collision-free by
  * construction), epochs decorrelate, and the expression is pure
  * scan-local arithmetic. */
class EpochShuffleSpec extends SparkTestBase {

  test("keys are collision-free over a dense id range (bijectivity)") {
    val n = 200000L
    val df = spark.range(0, n).toDF("doc_id")
      .select(EpochShuffle.shuffleKey("doc_id", 1).as("k"))
    assert(df.agg(countDistinct("k")).head.getLong(0) == n)
  }

  test("different epochs give uncorrelated orders; same epoch is stable") {
    val df = spark.range(0, 4096).toDF("doc_id")
      .select(col("doc_id"),
        EpochShuffle.shuffleKey("doc_id", 1).as("k1"),
        EpochShuffle.shuffleKey("doc_id", 2).as("k2"),
        EpochShuffle.shuffleKey("doc_id", 1).as("k1b"))
      .collect()
    assert(df.forall(r => r.getLong(1) == r.getLong(3)), "same epoch must be stable")
    // Order decorrelation: how many of the epoch-1-sorted ids keep a
    // neighbor in the epoch-2 order? For independent permutations of
    // 4096 the expected count is ~2; allow a generous ceiling.
    val e1 = df.sortBy(_.getLong(1)).map(_.getLong(0))
    val e2pos = df.sortBy(_.getLong(2)).map(_.getLong(0)).zipWithIndex.toMap
    val adjacentKept = e1.sliding(2).count {
      case Array(a, b) => math.abs(e2pos(a) - e2pos(b)) == 1
      case _           => false
    }
    assert(adjacentKept < 16, s"epochs look correlated: $adjacentKept adjacent pairs survive")
  }

  test("the key folds into the scan: no exchange, no join, codegen arithmetic") {
    val plan = graft.queries.ExtQueries.qx83(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
    assert(plan.contains("*(1) Project"), "the key projection must sit in a codegen stage")
  }
}
