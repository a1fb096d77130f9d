package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalCodec

/** Pins the perceptual dHash decoder (qx58's kernel): bit semantics on a
  * crafted gradient, the brightness-shift invariance that makes the hash
  * PERCEPTUAL rather than exact, the 4×14-bit band pigeonhole that makes
  * the near-dup join lossless at Hamming ≤ 3, and the decode-error
  * contract shared with the other real codecs.
  */
class DHashSpec extends SparkTestBase {

  /** 8×8 P6 image whose every channel at (x, y) is `base + x * step` —
    * constant per column, monotone in x. */
  private def gradientPpm(base: Int, step: Int): Array[Byte] = {
    val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * 64)
    System.arraycopy(header, 0, out, 0, header.length)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      out(header.length + 3 * (y * 8 + x) + c) = (base + x * step).toByte
    out
  }

  private def hashOf(payloads: (Long, Array[Byte])*): Map[Long, Long] = {
    import spark.implicits._
    MultimodalCodec.decodeDHash(payloads.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("dhash: strictly increasing gradient sets all 56 bits") {
    // w = 8 ⇒ sample column gx reads source column gx; every horizontal
    // neighbor strictly increases ⇒ every difference bit fires.
    val h = hashOf(1L -> gradientPpm(base = 10, step = 20))
    assert(h(1L) == (1L << 56) - 1)
  }

  test("dhash: flat image sets no bits; decreasing gradient sets none") {
    val h = hashOf(1L -> gradientPpm(base = 100, step = 0),
                   2L -> gradientPpm(base = 200, step = -10))
    assert(h(1L) == 0L && h(2L) == 0L)
  }

  test("dhash is invariant under a uniform brightness shift") {
    // The perceptual property: +60 on every sample preserves every
    // pairwise comparison, so the hash is identical.
    val h = hashOf(1L -> gradientPpm(base = 10, step = 15),
                   2L -> gradientPpm(base = 70, step = 15))
    assert(h(1L) == h(2L))
  }

  test("dhash bands: any pair within Hamming 3 shares >= 1 of 4 bands") {
    // Pigeonhole: 3 flipped bits cannot touch all 4 disjoint 14-bit
    // bands. Exhaustive over all C(56,3) three-bit flips of a fixed
    // base hash, checked directly on the band arithmetic the query and
    // oracle both use.
    val base = 0x00A5A5A5A5A5A5A5L & ((1L << 56) - 1)
    def bands(h: Long): Seq[Long] = (0 until 4).map(b => (h >> (14 * b)) & 16383L)
    val bs = bands(base)
    var checked = 0
    for (i <- 0 until 56; j <- i + 1 until 56; k <- j + 1 until 56) {
      val flipped = base ^ (1L << i) ^ (1L << j) ^ (1L << k)
      assert(bands(flipped).zip(bs).exists { case (a, b) => a == b },
        s"pair at Hamming 3 missed by banding: bits $i,$j,$k")
      checked += 1
    }
    assert(checked == 56 * 55 * 54 / 6)
  }

  test("dhash: corpus payloads collapse to the bounded class set") {
    import spark.implicits._
    // The generator's image is a pure function of (doc_id % 15 geometry,
    // doc_id % 256 phase): ids congruent mod 3840 give identical bytes,
    // so distinct hashes are bounded by 3840 at ANY corpus size — the
    // fact qx58's class-collapse step turns into a linear plan.
    val ids = (0L until 600L).map(_ * 64L) // spans many phases/geometries
    val media = ids.toDF("doc_id")
      .as[Long].map(id => (id, MultimodalCodec.syntheticPpm(id))).toDF("doc_id", "payload")
    val n = MultimodalCodec.decodeDHash(media).select("dhash").distinct().count()
    assert(n <= 3840 && n > 1)
    // And two ids 3840 apart hash identically (same image bytes).
    val h = hashOf(7L -> MultimodalCodec.syntheticPpm(7L),
                   3847L -> MultimodalCodec.syntheticPpm(3847L))
    assert(h(7L) == h(3847L))
  }

  test("dhash: malformed payload fails the task, never fabricates a hash") {
    import spark.implicits._
    val bad = Seq(1L -> "P6\n8\n255\n".getBytes("US-ASCII"))
    val ex = intercept[Exception] {
      MultimodalCodec.decodeDHash(bad.toDF("doc_id", "payload")).collect()
    }
    assert(ex.getMessage != null)
  }
}
