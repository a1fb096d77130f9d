package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.HllStream
import graft.streaming.HllStream.TokenObs

/** Streaming HLL ([[HllStream]]) — the online qx73: the state register
  * grid equals the BATCH grid cell for cell (statestore read-back)
  * under micro-batch splits, full re-delivery, and a SHUFFLED feed —
  * the order-insensitivity assertion no cursor processor can make. */
class HllStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** Raw (lang, wh) observations, duplicates included. */
  private def obs(): Seq[TokenObs] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(expr(
        "transform(filter(split(text, ' '), w -> length(w) > 0)," +
          " w -> aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003))")).as("wh"))
      .collect().map(r => TokenObs(r.getString(0), r.getLong(1))).toSeq

  /** The batch qx73 register grid, derived in plain Scala from the
    * same observations (an independent spelling). */
  private def batchGrid(rows: Seq[TokenObs]): Map[(String, Int), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, Int), Long]
    for (t <- rows) {
      val k = HllStream.keyOf(t.wh)
      val key = (t.lang, HllStream.regOf(k))
      val rho = HllStream.rhoOf(k)
      if (m.getOrElse(key, 0L) < rho) m(key) = rho
    }
    m.toMap
  }

  private def stateGrid(ckpt: String): Map[(String, Int), Long] =
    spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "hll").load()
      .selectExpr("key.value AS lang", "value.regs AS regs")
      .collect().flatMap { r =>
        val lang = r.getString(0)
        r.getSeq[Long](1).zipWithIndex.collect {
          case (v, i) if v != 0L => (lang, i) -> v
        }
      }.toMap

  test("state registers equal batch cell-for-cell under splits, replay, and shuffle") {
    val rows = obs()
    val expected = batchGrid(rows)
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[TokenObs]
    val ckpt = tmpDir("ckpt_hll")
    val input = MemoryStream[TokenObs]
    val q = HllStream.registers(input.toDS())
      .writeStream.format("memory").queryName("hll_s")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      // shuffled feed: reverse order, uneven splits
      val shuffled = rows.reverse
      shuffled.grouped(shuffled.size / 3 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
      // full duplicate re-delivery, original order
      input.addData(rows); q.processAllAvailable()
    } finally q.stop()
    val got = stateGrid(ckpt)
    assert(got.nonEmpty && got == expected,
      s"register divergence: stream-only=${(got.toSet -- expected.toSet).take(3)}, " +
        s"batch-only=${(expected.toSet -- got.toSet).take(3)}")
  }

  test("the same grid verifies against the qx73 gate output") {
    val gate = SparkEntry.queries("qx73_hll_registers")(spark, dir)
      .groupBy("lang").agg(sum("n_regs").as("nonempty")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = batchGrid(obs()).groupBy(_._1._1).map { case (l, xs) => l -> xs.size.toLong }
    assert(gate == plain, "gate register census != plain-Scala census")
  }
}
