package graft

import org.apache.spark.sql.functions._

/** qx108 — deterministic random walks on the domain graph. Pins walk
  * VALIDITY (every consecutive pair is a real edge), the dangling-stop
  * contract, signature integrity, per-step hash-argmin correctness
  * against a driver replay, and determinism under repartitioning. */
class RandomWalkSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private val P = 2147483647L

  private def edgesOf(): Map[Long, Seq[Long]] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    docs.flatMap(d => Seq((d % 40, (d * 7 + 3) % 40), (d % 40, (d * 13 + 11) % 40)))
      .filter(_._1 % 10 != 7).distinct
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq.sorted }
  }

  private def walkRows(): Seq[(Long, Long, Long, Long)] =
    queries.ExtQueries.qx108(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("walks are valid paths; dangling nodes stop immediately; sigs fold the path") {
    val adj = edgesOf()
    val rows = walkRows()
    val byStart = rows.groupBy(_._1)
    assert(byStart.keySet === (0L until 40L).toSet, "one walk per domain node")
    byStart.foreach { case (start, rs) =>
      val path = rs.sortBy(_._2)
      assert(path.head._2 === 0L && path.head._3 === start)
      // consecutive nodes are genuine edges
      path.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2 === a._2 + 1, s"start $start: steps must be contiguous")
          assert(adj.getOrElse(a._3, Seq.empty).contains(b._3),
            s"start $start: ${a._3}->${b._3} is not an edge")
        case _ =>
      }
      // dangling start -> only the step-0 row; non-dangling walks go 4 steps
      if (start % 10 == 7) assert(path.length === 1, s"dangling $start must stop at once")
      else {
        // any intermediate dangling node also stops the walk
        val last = path.last
        assert(path.length == 5 || adj.getOrElse(last._3, Seq.empty).isEmpty,
          s"start $start: short walk must end on a dangling node")
      }
      // signature = Horner fold of the visited prefix
      var sig = start
      path.foreach { r =>
        if (r._2 > 0) sig = (sig * 1009L + r._3) % P
        assert(r._4 === sig, s"start $start step ${r._2}: sig mismatch")
      }
    }
  }

  test("each step picks the argmin-hash neighbor (driver replay)") {
    val adj = edgesOf()
    val rows = walkRows()
    rows.groupBy(_._1).foreach { case (start, rs) =>
      val path = rs.sortBy(_._2).map(_._3)
      for (t <- 1 until path.length) {
        val u = path(t - 1)
        val want = adj(u).minBy(v => (u * 1000003L + t * 8191L + v * 97L + 13L) % P)
        assert(path(t) === want, s"start $start step $t: wrong neighbor")
      }
    }
  }

  test("deterministic under repartitioning") {
    val a = walkRows().sortBy(t => (t._1, t._2))
    spark.sparkContext.setLocalProperty("spark.sql.shuffle.partitions", "7")
    val b = walkRows().sortBy(t => (t._1, t._2))
    assert(a === b)
  }
}
