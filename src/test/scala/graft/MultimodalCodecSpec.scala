package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalCodec

/** The two renderings of the multimodal decode boundary must agree
  * row-for-row: the columnar stub (qx11's gate path) and the typed
  * mapPartitions codec slot (where a real decoder runs).
  */
class MultimodalCodecSpec extends SparkTestBase {

  private def media = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      unhex(md5(col("props"))).as("payload"))

  test("columnar and typed decode produce identical rows") {
    val cols = Seq("event_id", "event_type", "k", "payload_len", "first_byte")
    val columnar = MultimodalCodec.decodeColumnar(media).select(cols.map(col): _*)
    val typed = MultimodalCodec.decodeTyped(media).select(cols.map(col): _*)
    assert(columnar.count() == typed.count())
    assert(columnar.except(typed).isEmpty && typed.except(columnar).isEmpty)
  }

  test("columnar decode stays inside whole-stage codegen") {
    val plan = MultimodalCodec.decodeColumnar(media).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      "columnar path must not pay the typed ser/de fence")
    assert(plan.contains("*(1)"), "expected a WholeStageCodegen span") // `*(n)` = codegen stage n
  }

  test("typed decode is partition-parallel (no single-partition funnel)") {
    val parts = MultimodalCodec.decodeTyped(media).rdd.getNumPartitions
    assert(parts > 1 || media.rdd.getNumPartitions == 1)
  }
}
