package graft

import org.apache.spark.sql.functions._

/** The custom Catalyst expression `pq_adc` (codegen'd PQ asymmetric-
  * distance lookup sum): semantic equality with the declarative HOF
  * form, malformed-input null handling, and whole-stage-codegen
  * participation. The speedup that justifies it is recorded at the 100×
  * probe (365.7 → 78.8 s for qx42's scan — the HOF chain was slower than
  * qx2's full-precision long_dot scan; the kernel is ~1.5× cheaper). */
class PqAdcSpec extends SparkTestBase {

  // M = 8 banks of K = 16: lut[m·16 + codes[m]] summed — the HOF chain
  // qx42 originally shipped.
  private val HOF = "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (a, m) -> " +
    "a + element_at(lut, CAST(m * 16 + element_at(codes, m + 1) + 1 AS INT)))"

  test("pq_adc equals the HOF formulation across random luts and codes") {
    val df = spark.range(0, 2000)
      .selectExpr("id",
        "transform(sequence(0, 127), i -> CAST(hash(id, i) % 1000000 AS BIGINT)) AS lut",
        "transform(sequence(0, 7), m -> CAST(abs(hash(m, id)) % 16 AS BIGINT)) AS codes")
    val cmp = df.selectExpr("pq_adc(lut, codes) AS fast", s"$HOF AS slow")
      .where(col("fast") =!= col("slow"))
    assert(cmp.count() == 0)
  }

  test("pq_adc poisons malformed rows as NULL instead of erroring the scan") {
    val row = spark.sql(
      "SELECT pq_adc(NULL, array(0L)) AS a, " +                  // null input
        "pq_adc(array(1L, 2L, 3L), array(0L, 0L)) AS b, " +      // |lut| not divisible by M
        "pq_adc(array(1L, 2L), array(5L)) AS c, " +              // code outside its bank
        "pq_adc(array(1L, 2L), array(CAST(NULL AS BIGINT))) AS d, " + // null code
        "pq_adc(array(10L, 20L, 30L, 40L), array(1L, 0L)) AS ok").head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
    assert(row.getLong(4) == 20L + 30L) // bank 0 code 1, bank 1 code 0
  }

  test("pq_adc runs inside WholeStageCodegen") {
    val df = spark.range(0, 10)
      .selectExpr("transform(sequence(0, 31), i -> i + id) AS lut",
        "transform(sequence(0, 3), m -> CAST(m % 8 AS BIGINT)) AS codes")
      // lut referenced twice so CollapseProject keeps this projection
      // separate from the (codegen-fallback) transform HOFs above —
      // qx42's real plan has the same split: codes/luts are built in
      // aggregation stages, the ADC projection is pure column refs.
      .selectExpr("pq_adc(lut, codes) AS adc", "size(lut) AS sz")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("pq_adc") && l.trim.startsWith("*(")))
    df.collect()
  }
}
