package graft

import graft.operators.{AudioFingerprint, WavCodec}

/** Pins the perceptual audio fingerprint (qx76's kernel): exact gain
  * invariance (the property the planted twins rely on), discrimination
  * across seeds, the window contract, and the shared decode-error
  * behavior (a broken container throws; it never fabricates a
  * fingerprint). */
class AudioFingerprintSpec extends SparkTestBase {

  test("fingerprint is exactly invariant under volume gain") {
    for (id <- 0L to 50L) {
      val base = AudioFingerprint.fingerprint(WavCodec.syntheticWav(id, 1))
      val loud = AudioFingerprint.fingerprint(WavCodec.syntheticWav(id, 2))
      assert(base === loud, s"gain changed fingerprint for doc $id")
    }
  }

  test("different recordings fingerprint differently (spot checks)") {
    // same frame count (seeds ≡ mod 9, same parity) but distinct content
    val a = AudioFingerprint.fingerprint(WavCodec.syntheticWav(2L))
    val b = AudioFingerprint.fingerprint(WavCodec.syntheticWav(20L))
    assert(a._1 === b._1, "same window count by construction")
    assert(a._2 !== b._2, "distinct recordings should not collide here")
  }

  test("window count follows the complete-window contract") {
    // frames = 40 + (seed % 9) * 5; windows = frames / 8 (floor)
    val (nw, _) = AudioFingerprint.fingerprint(WavCodec.syntheticWav(3L)) // 55 frames
    assert(nw === 6)
    val (nw2, _) = AudioFingerprint.fingerprint(WavCodec.syntheticWav(0L)) // 40 frames
    assert(nw2 === 5)
  }

  test("a broken container throws through the fingerprint path") {
    val ok = WavCodec.syntheticWav(1L)
    assertThrows[Exception](AudioFingerprint.fingerprint(ok.dropRight(3)))
  }
}
