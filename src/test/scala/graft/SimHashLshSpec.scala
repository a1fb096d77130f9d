package graft

import org.apache.spark.sql.functions._

import graft.operators.SimHashLsh

/** Round-3 verdict #1 — the SimHash band space must track corpus size so
  * near-dup candidate pairs grow ~linearly past 1M docs, not ~n²/2¹⁵.
  * Pins (a) the integer width derivation (lockstep with the oracle SQL),
  * (b) the pigeonhole recall + exact Hamming semantics on crafted
  * signatures, and (c) the bounded per-doc candidate rate — analytically
  * at every n below the clamp, empirically across a 100× corpus sweep.
  */
class SimHashLshSpec extends SparkTestBase {

  test("keyBitsFor: integer log2 sizing, clamped to [6, 30]") {
    assert(SimHashLsh.keyBitsFor(0) == 6)
    assert(SimHashLsh.keyBitsFor(500) == 6)
    assert(SimHashLsh.keyBitsFor(5000) == 7)
    assert(SimHashLsh.keyBitsFor(50000) == 10)
    assert(SimHashLsh.keyBitsFor(1000000) == 14) // past the old 15-bit knee by 2M docs
    assert(SimHashLsh.keyBitsFor(100000000L) == 21)
    assert(SimHashLsh.keyBitsFor(1000000000L) == 24)
    assert(SimHashLsh.keyBitsFor(Long.MaxValue / 2) == 30) // ceiling
    // Lockstep with the oracle's SQL form: length(bin(x)) - 1.
    for (n <- Seq(33L, 64L, 1023L, 1024L, 123456789L, 40000000000L)) {
      val x = math.max(n / SimHashLsh.TargetOccupancy, 2L)
      val sqlForm = java.lang.Long.toBinaryString(x).length - 1
      val scalaForm = 63 - java.lang.Long.numberOfLeadingZeros(x)
      assert(sqlForm == scalaForm, s"derivations diverge at n=$n")
    }
  }

  test("nearDupPairs: pigeonhole recall + exact Hamming filter on crafted sigs") {
    import spark.implicits._
    // doc 1 = reference. doc 2: 3 bits flipped, all in band 0 (bands 1-3
    // still collide -> candidate; hamming 3 -> kept). doc 3: 1 bit flipped
    // in EVERY band (no band collides with doc 1 -> never a candidate;
    // hamming 4 would fail the filter anyway). doc 4: 4 bits flipped, all
    // in band 2 (candidate via bands 0/1/3; hamming 4 -> filtered).
    val sigs = Seq(
      (1L, 0L, 0L), (1L, 1L, 5L), (1L, 2L, 9L), (1L, 3L, 12L),
      (2L, 0L, 7L), (2L, 1L, 5L), (2L, 2L, 9L), (2L, 3L, 12L),
      (3L, 0L, 1L), (3L, 1L, 4L), (3L, 2L, 8L), (3L, 3L, 13L),
      (4L, 0L, 0L), (4L, 1L, 5L), (4L, 2L, 6L), (4L, 3L, 12L)
    ).toDF("doc_id", "band", "sig")
    val got = SimHashLsh.nearDupPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2) hamming 3 survives; (3,4) also differ from each other across
    // bands with no collision; only candidate-with-hamming<=3 remains.
    assert(got == Set((1L, 2L, 3L)), s"got $got")
  }

  test("candidate rate is bounded by design at every corpus size") {
    // Analytic half: the derived band width keeps per-band bucket
    // occupancy n / 2^width <= 2·TargetOccupancy at every n up to the
    // 30-bit clamp (n = 2^30·32 ≈ 34B docs) — so full-sig candidate
    // pairs are <= Bands · n · TargetOccupancy, LINEAR in n. This is the
    // round-3 scale claim, proved where the sweep below cannot reach.
    for (n <- Seq(100L, 50000L, 1000000L, 100000000L, 10000000000L, (1L << 30) * 32)) {
      val width = SimHashLsh.bandWidthFor(n)
      assert(n.toDouble / (1L << width).toDouble <= 2.0 * SimHashLsh.TargetOccupancy,
        s"occupancy bound broken at n=$n (width=$width)")
    }
    // Empirical half — synthetic word-hash multisets, 31 words/doc (odd
    // => vote sums never tie at 0, fingerprint bits unbiased), generated
    // without driver data: measured candidates stay under the linear
    // bound across a 100× sweep.
    def wordRows(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      explode(expr("sequence(0, 30)")).as("i"))
      .select(col("doc_id"), expr("pmod(xxhash64(doc_id * 131 + i), 1000003)").as("x"))

    val counts: Seq[(Long, Long)] = Seq(500L, 5000L, 50000L).map { n =>
      val sigs = SimHashLsh.bandSigs(wordRows(n), SimHashLsh.bandWidthFor(n))
      val cand = SimHashLsh.candidatePairs(sigs).count()
      val bound = SimHashLsh.Bands * n * 2 * SimHashLsh.TargetOccupancy
      assert(cand <= bound, s"n=$n: $cand candidates exceeds linear bound $bound")
      n -> cand
    }
    info(s"candidate pairs per corpus size: $counts")
  }
}
