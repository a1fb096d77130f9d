package graft

import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** Scale techniques the 100 TB posture calls for: skew salting and
  * bucketed (exchange-free) joins.
  */
class ScaleTechniqueSpec extends SparkTestBase {

  test("salted join equals plain join on skewed data and spreads the hot key") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail.
    val left = spark.range(0, 10000).select(
      when(col("id") < 9000, lit(1L)).otherwise(col("id") % 50 + 2).as("k"),
      col("id").as("v"))
    val right = Seq((1L, "hot"), (2L, "cold"), (3L, "cool")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = SaltedJoin.inner(left, right, "k", salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // The hot key's rows really do land in several shuffle partitions:
    // group the salted left side the way the join shuffles it.
    val spread = left.withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .where(col("k") === 1).select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("salt source contract: full-row duplicates funnel, a row-unique salt source spreads them") {
    import spark.implicits._
    // A hot key whose rows are IDENTICAL in every column: the default
    // (all-columns-hash) salt has nothing to route on — every duplicate
    // lands in ONE salt group (the r11 review's funnel, now the
    // documented contract) — while naming a row-unique salt source
    // makes the spread unconditional. Both spellings stay correct
    // (same multiset as the plain join, duplicates preserved).
    val dup = spark.range(0, 8000).select(lit(1L).as("k"), lit("same").as("payload"))
      .withColumn("rid", monotonically_increasing_id())
    val right = Seq((1L, 7L)).toDF("k", "quota")
    val plainCount = dup.join(right, "k").count()

    val funneled = SaltedJoin.inner(dup.drop("rid"), right, "k", salts = 8)
    assert(funneled.count() == plainCount, "correctness holds even when funneled")
    val dupSalts = dup.drop("rid")
      .withColumn("__salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .select("__salt").distinct().count()
    assert(dupSalts == 1L,
      "full-row duplicates must demonstrate the documented single-salt funnel")

    val spreadRes = SaltedJoin.inner(dup, right, "k", salts = 8,
      saltSource = Some("rid"))
    assert(spreadRes.count() == plainCount)
    val ridSalts = dup.withColumn("__salt", pmod(hash(col("rid")), lit(8)))
      .select("__salt").distinct().count()
    assert(ridSalts == 8L,
      s"a row-unique salt source must spread the hot key over all salts, got $ridSalts")
  }

  test("testdata event times are non-negative (div-vs-floor window invariant)") {
    // q04/q06/q12/q15 bucket event time with integer `div`, which truncates
    // toward zero; window() floors. The two agree iff ts_ms >= 0 — pin the
    // invariant the batch twins rely on (CoreQueries.q04 doc).
    val dir = "/root/testdata/sf0.001"
    val minTs = graft.sources.Tables.sensorReadings(spark, dir)
      .agg(min("ts_ms")).head.getLong(0)
    assert(minTs >= 0L, s"pre-epoch ts_ms $minTs breaks div-bucket windows")
    val minEvTs = graft.sources.Tables.events(spark, dir)
      .agg(min("ts")).head.getLong(0)
    assert(minEvTs >= 0L)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "i")
    orders.write.bucketBy(8, "key").sortBy("key").saveAsTable("b_orders")
    items.write.bucketBy(8, "key").sortBy("key").saveAsTable("b_items")
    // Disable auto-broadcast so the planner faces the real choice a 100 TB
    // join faces (both sides too big to broadcast): bucketing must then
    // eliminate the shuffle entirely.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_items"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange")) // co-located by bucket: no shuffle
      assert(joined.count() == 3000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
