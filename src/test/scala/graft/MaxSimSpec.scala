package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.MaxSim]] — the fused late-interaction kernel.
  * Pins: (1) bit-equality against the declarative slice/long_dot/greatest
  * spelling on the real corpus (both the interpreted eval and the codegen
  * path score the same pairs); (2) hand-computed tiny case; (3) null /
  * shape semantics; (4) the ascending-i accumulation order (the oracle's
  * explicit parenthesization). */
class MaxSimSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** The declarative spelling the kernel replaces: 2·t² sliced arrays per
    * pair, greatest() per query token, explicit left-assoc adds. */
  private def declarative(t: Int, sub: Int): String = {
    def cos(i: Int, j: Int) =
      s"""(CASE WHEN long_dot(slice(qiv, ${i * sub + 1}, $sub), slice(qiv, ${i * sub + 1}, $sub)) = 0L
         |   OR long_dot(slice(iv, ${j * sub + 1}, $sub), slice(iv, ${j * sub + 1}, $sub)) = 0L THEN 0.0D
         | ELSE CAST(long_dot(slice(qiv, ${i * sub + 1}, $sub), slice(iv, ${j * sub + 1}, $sub)) AS DOUBLE)
         |   / (sqrt(CAST(long_dot(slice(qiv, ${i * sub + 1}, $sub), slice(qiv, ${i * sub + 1}, $sub)) AS DOUBLE))
         |      * sqrt(CAST(long_dot(slice(iv, ${j * sub + 1}, $sub), slice(iv, ${j * sub + 1}, $sub)) AS DOUBLE))) END)""".stripMargin
    def m(i: Int) = s"greatest(${(0 until t).map(j => cos(i, j)).mkString(", ")})"
    (1 until t).foldLeft(s"(${m(0)})")((acc, i) => s"($acc + ${m(i)})")
  }

  test("kernel == declarative slice/greatest spelling on the corpus") {
    val base = queries.ExtQueries.intEmbeddingsFrom(
      sources.Tables.embeddings(spark, dir))
    val q = base.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    val pairs = base.limit(200).crossJoin(broadcast(q.limit(3)))
    val both = pairs
      .withColumn("k", expr("max_sim(qiv, iv, 4)"))
      .withColumn("d", expr(declarative(4, 16)))
    assert(both.where(col("k") =!= col("d")).count() === 0)
    assert(both.count() === 600)
  }

  test("hand case: per-token argmax and ascending-order sum") {
    val df = spark.sql(
      """SELECT max_sim(array(1L, 0L, 0L, 1L), array(1L, 0L, 0L, 2L), 2) AS s,
        |       max_sim(array(1L, 0L, 0L, 1L), array(1L, 0L, 0L, 2L), 1) AS whole""".stripMargin)
    val r = df.collect().head
    // t=2, sub=2: q tokens (1,0),(0,1); d tokens (1,0),(0,2).
    // token 0: cos((1,0),(1,0))=1, cos((1,0),(0,2))=0 -> 1
    // token 1: cos((0,1),(1,0))=0, cos((0,1),(0,2))=1 -> 1
    assert(r.getDouble(0) === 2.0)
    // t=1 degenerates to whole-vector cosine: dot=3, |q|=sqrt2, |d|=sqrt5
    assert(math.abs(r.getDouble(1) - 3.0 / (math.sqrt(2.0) * math.sqrt(5.0))) < 1e-15)
  }

  test("zero-norm sub-vector contributes cosine 0, not NaN") {
    val r = spark.sql(
      "SELECT max_sim(array(0L, 0L, 1L, 1L), array(1L, 1L, 0L, 0L), 2) AS s")
      .collect().head.getDouble(0)
    // q token 0 is zero-norm -> its max over d tokens is 0 (not NaN);
    // q token 1 = (1,1) vs d tokens (1,1) and (0,0): max = cos((1,1),(1,1))
    // = 2/(√2·√2), which in IEEE doubles is 1-ulp under 1.0 — assert the
    // exact same expression, not the algebraic 1.0.
    assert(!r.isNaN)
    assert(r === 0.0 + 2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
  }

  test("null semantics: null array, null element, length mismatch, non-divisible") {
    val rows = spark.sql(
      """SELECT max_sim(CAST(NULL AS ARRAY<BIGINT>), array(1L, 2L), 2) AS a,
        |       max_sim(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L), 2) AS b,
        |       max_sim(array(1L, 2L), array(1L, 2L, 3L), 1) AS c,
        |       max_sim(array(1L, 2L, 3L), array(1L, 2L, 3L), 2) AS d""".stripMargin)
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2) && rows.isNullAt(3))
  }

  test("t must be a foldable positive INT") {
    val e = intercept[Exception] {
      spark.sql("SELECT max_sim(array(1L), array(1L), 0)").collect()
    }
    assert(e.getMessage.contains("max_sim") || e.getMessage.contains("foldable"))
  }

  test("a NULL INT literal for t is a type-check failure, not an analysis NPE") {
    // CAST(NULL AS INT) is foldable IntegerType folding to null — must
    // surface as the max_sim type-check message, never NullPointerException
    val e = intercept[Exception] {
      spark.sql("SELECT max_sim(array(1L), array(1L), CAST(NULL AS INT))").collect()
    }
    assert(!e.isInstanceOf[NullPointerException])
    assert(e.getMessage.contains("max_sim") || e.getMessage.contains("foldable"))
  }
}
