package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/** Property proofs for the bloom_agg Catalyst aggregate + its probeSql
  * twin (the qx32 decontamination prescreen): no false negatives ever,
  * false positives rare and killed by the exact confirm, and the OR-merge
  * invariant that makes the build order-independent. End-to-end
  * correctness of qx32 itself is the DuckDB oracle gate's job (the bloom
  * is invisible there by construction). */
class BloomAggSpec extends SparkTestBase {
  import spark.implicits._

  private val MWords = 1024
  private val D = 3

  private def bloomOf(keys: Seq[Long], parts: Int): Array[Long] =
    keys.toDF("s").repartition(parts)
      .agg(expr(s"bloom_agg(s, $MWords, $D)").as("bf"))
      .head().getSeq[Long](0).toArray

  private val members = (0L until 2000L).map(i => (i * 1000003L + 7L) % 2147483647L)

  test("bloom_agg: every inserted key passes the probe (no false negatives)") {
    val bf = bloomOf(members, 4)
    val bfDf = Seq(Tuple1(bf)).toDF("bf")
    val hits = members.toDF("s").crossJoin(broadcast(bfDf))
      .where(expr(BloomFilter.probeSql("bf", "s", MWords, D)))
      .count()
    assert(hits == members.size)
  }

  test("bloom_agg: false-positive rate stays near the design point") {
    val bf = bloomOf(members, 4)
    val bfDf = Seq(Tuple1(bf)).toDF("bf")
    // Disjoint probe set: a different affine family cannot collide with
    // the member VALUES except by chance.
    val nonMembers = (0L until 10000L).map(i => (i * 999983L + 123457L) % 2147483647L)
      .filterNot(members.toSet)
    val fps = nonMembers.toDF("s").crossJoin(broadcast(bfDf))
      .where(expr(BloomFilter.probeSql("bf", "s", MWords, D)))
      .count()
    // Design fp at n=2000, m=65536, d=3 is ~0.07%; 1% is ten-fold slack.
    assert(fps.toDouble / nonMembers.size < 0.01,
      s"false-positive rate ${fps.toDouble / nonMembers.size} out of spec")
  }

  test("bloom_agg: the OR-merge makes the image partition-order invariant") {
    assert(bloomOf(members, 1).toSeq == bloomOf(members, 7).toSeq)
  }

  test("bloom_agg: bitOf and probeSql agree bit for bit") {
    // The Scala build path and the SQL probe path share BloomFilter's
    // arithmetic by construction; pin it anyway against refactors.
    val h = 1234567L
    val bits = (0 until D).map(i => BloomFilter.bitOf(h, i, MWords))
    val sqlBits = spark.sql(
      (0 until D).map(i =>
        s"SELECT pmod(pmod(CAST($h AS BIGINT) * ${BloomFilter.a(i)} + ${BloomFilter.b(i)}, ${BloomFilter.P}), ${64L * MWords}) AS b")
        .mkString(" UNION ALL ")).collect().map(_.getLong(0)).toSeq
    assert(bits == sqlBits)
  }

  test("bloom_agg: negative keys build and probe without crashing") {
    // Round-6 advice: bloom_agg is a registered SQL function, so a
    // negative BIGINT key must not turn into a negative buffer index.
    // floorMod/pmod keep build and probe in agreement for ANY sign.
    import spark.implicits._
    // Domain: |h| < 2³¹ (the same h·a overflow bound the positive path
    // documents — beyond it ANSI mode rejects the multiply itself).
    val keys = Seq(-1L, -1234567890L, -2147483646L, 42L)
    val img = keys.toDF("s").agg(expr(s"bloom_agg(s, $MWords, $D)").as("bf"))
    val hits = img.crossJoin(keys.toDF("s"))
      .where(expr(BloomFilter.probeSql("bf", "s", MWords, D)))
      .count()
    assert(hits == keys.size, "inserted negative key failed its own probe")
    for (h <- keys; i <- 0 until D) {
      val bit = BloomFilter.bitOf(h, i, MWords)
      assert(bit >= 0 && bit < 64L * MWords, s"bit $bit out of range for key $h")
    }
  }
}
