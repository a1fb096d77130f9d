package graft

import org.apache.spark.sql.functions._

import graft.operators.MixSchedule

/** [[MixSchedule]] (the qx89 engine): the closed-form position equals
  * the sort definition, the schedule is a bijection, and stride
  * scheduling's smoothness bound holds. */
class MixScheduleSpec extends SparkTestBase {

  private def sched(allocs: (String, Long)*) = {
    import spark.implicits._
    MixSchedule.schedule(allocs.toDF("lang", "alloc"))
      .select("lang", "j", "d", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("closed-form positions equal the sort-by-deadline definition") {
    val rows = sched(("a", 7L), ("b", 19L), ("c", 3L), ("d", 1L))
    val bySort = rows.sortBy(_._3).zipWithIndex
      .map { case ((l, j, _, _), i) => (l, j) -> (i + 1L) }.toMap
    rows.foreach { case (l, j, _, pos) =>
      assert(pos == bySort((l, j)), s"($l,$j)")
    }
  }

  test("the schedule is a bijection onto [1, B]") {
    val rows = sched(("x", 13L), ("y", 8L), ("z", 29L))
    val b = 13L + 8L + 29L
    assert(rows.length == b)
    assert(rows.map(_._4).sorted.toSeq == (1L to b))
  }

  test("stride smoothness: language gaps stay within twice the ideal stride") {
    val rows = sched(("big", 600L), ("mid", 250L), ("small", 150L))
    val b = 1000L
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val alloc = rs.length.toLong
      val poss = rs.sortBy(_._2).map(_._4)
      val maxGap = poss.sliding(2).map { case Array(a2, b2) => b2 - a2 }.max
      assert(maxGap <= 2L * (b / alloc + 1L),
        s"$l: max gap $maxGap vs ideal stride ${b / alloc}")
    }
  }

  test("closed-form gap equals lag(pos) over (lang, j) — the audit's window, scan-local") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val s = MixSchedule.schedule(
      Seq(("a", 7L), ("b", 19L), ("c", 3L), ("d", 1L)).toDF("lang", "alloc"))
    val lagged = s.withColumn("gap_w",
      col("pos") - lag("pos", 1).over(Window.partitionBy("lang").orderBy("j")))
    val bad = lagged.where(
      (col("gap").isNull =!= col("gap_w").isNull) ||
        (col("gap").isNotNull && col("gap") =!= col("gap_w"))).count()
    assert(bad == 0L, "closed-form gap diverges from the lag-window definition")
  }

  test("the schedule plan has no global sort; sorts/shuffles touch only the language table") {
    import spark.implicits._
    val plan = MixSchedule.schedule(Seq(("a", 5L), ("b", 3L)).toDF("lang", "alloc"))
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toIndexedSeq
    // Every Sort / shuffle exchange must sit directly on the in-memory
    // language table (the ≤hundreds-row side that feeds the broadcasts);
    // the B-row Range spine must reach the projections through joins only.
    lines.zipWithIndex.filter(li => li._1.contains("Sort ") || li._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val below = lines.slice(i + 1, i + 4).mkString("\n")
        // "Scan ExistingRDD": the language table is pinned by a
        // localCheckpoint since round 17 — still the ≤hundreds-row side.
        assert(below.contains("LocalTableScan") ||
          below.contains("Exchange SinglePartition") ||
          below.contains("Scan ExistingRDD"),
          s"a sort/shuffle escaped the language table (line $i):\n$plan")
      }
    val rangeLine = lines.indexWhere(_.contains("Range ("))
    val spinePrefix = lines(rangeLine).takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-')
    // Ancestors of Range print above it at shallower tree depth on the
    // unprefixed spine; none of them may be a Sort or shuffle.
    lines.take(rangeLine)
      .filter(l => !l.contains(":") && l.length < spinePrefix.length + 40)
      .foreach(l => assert(!l.contains("Sort") && !l.contains("ShuffleExchange"),
        s"the B-row spine must stay sort/shuffle-free:\n$plan"))
  }
}
