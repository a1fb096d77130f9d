package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CmsStream
import graft.streaming.CmsStream.DocWords

/** Streaming count-min sketch ([[CmsStream]]) — the online qx33: after
  * any micro-batch split of an id-ordered feed, the state grid equals
  * the batch grid CELL FOR CELL (read back through the state-store data
  * source, the F11 pattern), and re-delivered waves are no-ops. */
class CmsStreamSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def docWords(): Seq[DocWords] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("doc_id"), expr(
        "transform(filter(split(text, ' '), w -> length(w) > 0)," +
          " w -> aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003))").as("whs"))
      .collect().map(r => DocWords(r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq.sortBy(_.doc_id)

  /** qx33's cell-grid derivation (same hash constants), nonzero cells. */
  private def batchGrid(): Map[(String, Int, Int), Long] = {
    def colOf(i: Int) =
      s"(((wh * ${1000003L * (i + 1) + 31L} + ${977L * (i + 1)}) % 2147483647) % ${CmsStream.W})"
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(expr(
        "transform(filter(split(text, ' '), w -> length(w) > 0)," +
          " w -> aggregate(split(w, ''), 0L, (a, c) -> (a*31 + ascii(c)) % 1000003))")).as("wh"))
      .groupBy("lang", "wh").agg(count(lit(1)).as("exact"))
      .select(col("lang"), col("exact"), posexplode(array((0 until CmsStream.D).map(i =>
        expr(colOf(i))): _*)).as(Seq("row", "c")))
      .groupBy("lang", "row", "c").agg(sum("exact").as("cell_cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2).toInt) -> r.getLong(3))
      .toMap
  }

  private def stateGrid(ckpt: String): Map[(String, Int, Int), Long] =
    spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "cms").load()
      .selectExpr("key.value AS lang", "value.cells AS cells")
      .collect().flatMap { r =>
        val lang = r.getString(0)
        r.getSeq[Long](1).zipWithIndex.collect {
          case (cnt, idx) if cnt != 0L =>
            (lang, idx / CmsStream.W, idx % CmsStream.W) -> cnt
        }
      }.toMap

  test("state grid equals the batch grid cell for cell across splits") {
    val docs = docWords()
    val expected = batchGrid()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocWords]
    val ckpt = tmpDir("ckpt_cms1")
    val input = MemoryStream[DocWords]
    val q = CmsStream.grids(input.toDS())
      .writeStream.format("memory").queryName("cms_s1")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      docs.grouped(docs.size / 4 + 1).foreach { w =>
        input.addData(w); q.processAllAvailable()
      }
    } finally q.stop()
    val got = stateGrid(ckpt)
    assert(got.nonEmpty && got == expected,
      s"grid divergence: stream-only=${(got.toSet -- expected.toSet).take(3)}, " +
        s"batch-only=${(expected.toSet -- got.toSet).take(3)}")
  }

  test("re-delivered waves are no-ops (cursor replay discipline)") {
    val docs = docWords()
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[DocWords]
    val ckpt = tmpDir("ckpt_cms2")
    val input = MemoryStream[DocWords]
    val q = CmsStream.grids(input.toDS())
      .writeStream.format("memory").queryName("cms_s2")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      val (w1, w2) = docs.splitAt(docs.size / 2)
      input.addData(w1); q.processAllAvailable()
      input.addData(w2); q.processAllAvailable()
      input.addData(w1); q.processAllAvailable() // at-least-once re-delivery
    } finally q.stop()
    assert(stateGrid(ckpt) == batchGrid(), "replayed wave moved the grid")
  }
}
