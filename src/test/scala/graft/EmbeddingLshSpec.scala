package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingLsh

/** Round-2 verdict #1 — the LSH bucket space must track corpus size so
  * candidate pairs grow ~linearly, not ~n²/buckets. This spec pins (a) the
  * integer plane-count derivation, and (b) the linear candidate bound
  * empirically across a 100× corpus-size sweep.
  */
class EmbeddingLshSpec extends SparkTestBase {

  test("planesFor: integer log2 sizing, clamped to [6, 24]") {
    assert(EmbeddingLsh.planesFor(0) == 6) // degenerate corpora hit the floor
    assert(EmbeddingLsh.planesFor(500) == 6)
    assert(EmbeddingLsh.planesFor(2000) == 6)
    assert(EmbeddingLsh.planesFor(5000) == 7) // 5000/32 = 156 → floor log2 = 7
    assert(EmbeddingLsh.planesFor(50000) == 10)
    assert(EmbeddingLsh.planesFor(1000000) == 14)
    assert(EmbeddingLsh.planesFor(1000000000L) == 24) // 1e9 → ceiling
    assert(EmbeddingLsh.planesFor(Long.MaxValue / 2) == 24)
    // Lockstep with the oracle's SQL form: length(bin(x)) - 1.
    for (n <- Seq(33L, 64L, 1023L, 1024L, 123456789L)) {
      val x = math.max(n / EmbeddingLsh.TargetOccupancy, 2L)
      val sqlForm = java.lang.Long.toBinaryString(x).length - 1
      val scalaForm = 63 - java.lang.Long.numberOfLeadingZeros(x)
      assert(sqlForm == scalaForm, s"derivations diverge at n=$n")
    }
  }

  test("candidate pairs stay ~linear across a 100x corpus sweep") {
    // Deterministic pseudo-random integer embeddings (same ±1e6 range the
    // quantized real table has), generated without any driver-side data.
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "CAST(pmod(xxhash64(id * 64 + d), 2000001) - 1000000 AS BIGINT))").as("iv"))

    val counts = Seq(500L, 5000L, 50000L).map { n =>
      val sigs = EmbeddingLsh.bandSigs(corpus(n), EmbeddingLsh.planesFor(n))
      val cand = EmbeddingLsh.candidatePairs(sigs).count()
      // The design bound: ≤ bands · n · 2·targetOcc candidate pairs for a
      // uniform corpus (occupancy ∈ [targetOcc, 2·targetOcc) by sizing).
      val bound = EmbeddingLsh.Bands * n * 2 * EmbeddingLsh.TargetOccupancy
      assert(cand <= bound, s"n=$n: $cand candidates exceeds linear bound $bound")
      n -> cand
    }
    info(s"candidate pairs per corpus size: $counts")
    // 100× more vectors must NOT cost ~100²× more candidates: allow the
    // linear 100× times the ≤8× occupancy wobble the clamp permits.
    val ratio = counts.last._2.toDouble / counts.head._2.toDouble
    assert(ratio < 800.0, s"candidate growth $ratio over 100× data looks superlinear")
  }
}
