package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

import graft.queries.ExtQueries

/** The measured broadcast gate (qx59/qx63): above the ceiling the model
  * join must FALL BACK to a shuffle join — and the fallback must be
  * result-identical to the broadcast plan. Gate corpora always fit the
  * ceiling, so without this spec the fallback branch would ship
  * unexercised; here both paths run, their results compare row for
  * row, and both physical shapes are pinned. */
class BroadcastGateSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Count model joins in the non-AQE plan with stats-driven
    * auto-broadcast off — the pin is about the HINT the query places,
    * not what tiny-SF statistics would rescue at runtime. */
  private def modelJoins(mk: => DataFrame, key: String): (Int, Int) = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = mk.queryExecution.executedPlan
      val bc = plan.collect {
        case j: BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains(key)) => j
      }.size
      val shuffled = plan.collect {
        case j: SortMergeJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains(key)) => j
        case j: ShuffledHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains(key)) => j
      }.size
      (bc, shuffled)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("qx59: the shuffle fallback equals the broadcast plan row for row") {
    val bcPlan = ExtQueries.qx59At(spark, dir, Long.MaxValue)
    val shPlan = ExtQueries.qx59At(spark, dir, 0L)
    assert(rows(bcPlan) == rows(shPlan), "qx59 fallback changed the result")
    val (bcB, _) = modelJoins(ExtQueries.qx59At(spark, dir, Long.MaxValue), "w1")
    val (shB, shS) = modelJoins(ExtQueries.qx59At(spark, dir, 0L), "w1")
    assert(bcB >= 2, s"broadcast path must broadcast both count tables (saw $bcB)")
    assert(shS >= 1 && shB == 0,
      s"fallback path must shuffle-join the model, not broadcast it (bc=$shB, shuffled=$shS)")
  }

  test("qx63: the shuffle fallback equals the broadcast plan row for row") {
    val bcPlan = ExtQueries.qx63At(spark, dir, Long.MaxValue)
    val shPlan = ExtQueries.qx63At(spark, dir, 0L)
    assert(rows(bcPlan) == rows(shPlan), "qx63 fallback changed the result")
    val (bcB, _) = modelJoins(ExtQueries.qx63At(spark, dir, Long.MaxValue), "word")
    val (shB, shS) = modelJoins(ExtQueries.qx63At(spark, dir, 0L), "word")
    assert(bcB >= 1, s"broadcast path must broadcast the class counts (saw $bcB)")
    assert(shS >= 1 && shB == 0,
      s"fallback path must shuffle-join the model, not broadcast it (bc=$shB, shuffled=$shS)")
  }
}
