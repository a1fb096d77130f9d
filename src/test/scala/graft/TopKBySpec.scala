package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.functions.TopKBy]] — the bounded-heap top-k aggregate the ANN
  * queries rank with. Proofs: row-identity with the window spelling it
  * replaced (including score ties), correct merge across many partitions,
  * and the plan property that motivates it — the scored candidate rows
  * are pruned to k per (group, map task) BEFORE any exchange, where the
  * window spelling exchanged them all. */
class TopKBySpec extends SparkTestBase {
  import spark.implicits._

  test("topk_by equals the row_number window prefix, ties broken by id asc") {
    // Deterministic synthetic scores with deliberate collisions: score
    // depends only on id % 17, so every group has many exact ties.
    val scored = spark.range(2000).select(
      (col("id") % 7).as("qid"),
      col("id").as("vec_id"),
      (pmod(col("id") * col("id"), lit(17)) / 16.0).as("cosine"))
      .repartition(13)                     // force multi-buffer merges
    val viaAgg = scored.groupBy("qid")
      .agg(expr("topk_by(cosine, vec_id, 5)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("p", "t")))
      .select(col("qid"), (col("p") + 1).as("rk"),
        col("t.id").as("vec_id"), col("t.score").as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    val viaWindow = scored
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select("qid", "rk", "vec_id", "cosine")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    assert(viaAgg.count() == 35)           // 7 groups × 5
  }

  test("groups smaller than k emit their full membership, ranked") {
    val tiny = Seq((0L, 1L, 0.5), (0L, 2L, 0.9), (1L, 3L, 0.1))
      .toDF("qid", "vec_id", "cosine")
    val got = tiny.groupBy("qid")
      .agg(expr("topk_by(cosine, vec_id, 5)").as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("p", "t")))
      .select(col("qid"), (col("p") + 1).as("rk"), col("t.id").as("vec_id"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((0L, 1, 2L), (0L, 2, 1L), (1L, 1, 3L)))
  }

  test("null scores are skipped, not ranked") {
    val withNulls = Seq((0L, 1L, Some(0.5)), (0L, 2L, None), (0L, 3L, Some(0.7)))
      .toDF("qid", "vec_id", "cosine")
    val got = withNulls.groupBy("qid")
      .agg(expr("topk_by(cosine, vec_id, 2)").as("tk"))
      .select(explode(col("tk")).as("t")).select(col("t.id").as("vec_id"))
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 1L))
  }

  test("qx2's scored rows never reach an exchange: partial prune upstream") {
    // The aggregate must plan as ObjectHashAggregate(partial) → Exchange →
    // ObjectHashAggregate(final): the exchange moves only the serialized
    // ≤k-entry buffers. A Window in this plan (the old spelling) meant the
    // full n·q scored set crossed the wire.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries("qx2_cosine_topk")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      assert(plan.toString.contains("ObjectHashAggregate"))
      assert(!plan.toString.contains("Window"), "top-k must not re-introduce a window")
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      // No exchange input may carry the per-candidate cosine rows — only
      // aggregation buffers (BinaryType) keyed by qid.
      val leaky = exchanges.filter(_.child.output.exists(_.name == "cosine"))
      assert(leaky.isEmpty, s"scored rows cross an exchange: ${leaky.map(_.child.output)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
