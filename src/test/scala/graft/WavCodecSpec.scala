package graft

import graft.operators.WavCodec

/** The RIFF/WAVE decoder: container grammar (chunk walk, word-alignment
  * padding, unknown-chunk skipping), 16-bit LE sample semantics, and the
  * qx48 closed-form agreement in miniature.
  */
class WavCodecSpec extends SparkTestBase {

  test("parseWavHeader walks chunks, skips JUNK, honors odd-size padding") {
    // Even doc (junk body 6, no pad) and odd doc (junk body 5, padded).
    for (id <- Seq(2L, 3L)) {
      val h = WavCodec.parseWavHeader(WavCodec.syntheticWav(id))
      assert(h.channels == 1 + (id % 2).toInt, s"channels wrong for doc $id")
      assert(h.nFrames == (40 + (id % 9) * 5).toInt, s"frames wrong for doc $id")
      assert(h.sampleRate == 8000 + (id % 3).toInt * 4000, s"rate wrong for doc $id")
    }
  }

  test("parseWavHeader rejects malformed containers instead of fabricating") {
    val good = WavCodec.syntheticWav(7L)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    val bad = Seq(
      mutated(b => b(0) = 'X'),                        // not RIFF
      mutated(b => b(8) = 'A'),                        // RIFF form not WAVE
      mutated(b => b(4) = (b(4) + 1).toByte),          // RIFF size != payload
      good.take(good.length - 1),                      // truncated data chunk
      good.take(20))                                   // no fmt/data at all
    for (b <- bad)
      assertThrows[IllegalArgumentException](WavCodec.parseWavHeader(b))
    // Corrupt the fmt tag (offset: RIFF(12) + JUNK(8+5+1) + 8) → non-PCM.
    val fmtBody = 12 + 8 + 6 + 8
    assertThrows[IllegalArgumentException](
      WavCodec.parseWavHeader(mutated(b => b(fmtBody) = 2)))
  }

  test("16-bit samples are sign-extended little-endian") {
    // One mono frame holding -2 (0xFFFE LE).
    val b = new java.io.ByteArrayOutputStream()
    def cc(s: String) = b.write(s.getBytes("US-ASCII"))
    def u16(v: Int) = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    def u32(v: Int) = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    cc("RIFF"); u32(4 + 24 + 10); cc("WAVE")
    cc("fmt "); u32(16); u16(1); u16(1); u32(8000); u32(16000); u16(2); u16(16)
    cc("data"); u32(2); u16(0xfffe)
    val df = spark.createDataFrame(Seq((1L, b.toByteArray))).toDF("doc_id", "payload")
    val r = WavCodec.decodeWav(df).head()
    assert(r.getLong(4) == -2L && r.getLong(5) == -2L && r.getLong(6) == -2L,
      s"0xFFFE must decode as -2: $r")
  }

  test("decodeWav stats match the closed form on the synthetic corpus") {
    // The qx48 gate in miniature: real container bytes in, generator
    // formula out — per channel.
    val ids = (0L until 120L)
    val df = spark.createDataFrame(ids.map(id => (id, WavCodec.syntheticWav(id))))
      .toDF("doc_id", "payload")
    val got = WavCodec.decodeWav(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    for (id <- ids; c <- 0 until (1 + (id % 2).toInt)) {
      val frames = (40 + (id % 9) * 5).toInt
      val s = (0 until frames).map(i => ((id * 37 + i * 13 + c * 101 + 7) % 4001).toInt - 2000)
      val r = got((id, c.toLong))
      assert(r.getLong(2) == 8000 + (id % 3) * 4000 && r.getLong(3) == frames.toLong,
        s"format fields wrong for doc $id ch $c: $r")
      assert(r.getLong(4) == s.map(_.toLong).sum && r.getLong(5) == s.min &&
        r.getLong(6) == s.max, s"sample stats wrong for doc $id ch $c")
      assert(r.getLong(7) == s.indices.map(i => s(i).toLong * (i + 1)).sum,
        s"weighted checksum wrong for doc $id ch $c")
    }
    // Coverage: both channel counts actually occurred.
    assert(got.keys.exists(_._2 == 1L) && got.keys.exists(_._2 == 0L))
  }

  // --- windowed feature extraction (qx52) -----------------------------

  test("featuresWindowed matches a scalar reference on the synthetic corpus") {
    val ids = (0L until 90L)
    val df = spark.createDataFrame(ids.map(id => (id, WavCodec.syntheticWav(id))))
      .toDF("doc_id", "payload")
    val got = WavCodec.featuresWindowed(df, window = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r).toMap
    var partialSeen = 0
    for (id <- ids; c <- 0 until (1 + (id % 2).toInt)) {
      val frames = (40 + (id % 9) * 5).toInt
      val s = (0 until frames).map(i => ((id * 37 + i * 13 + c * 101 + 7) % 4001).toInt - 2000)
      for ((w, win) <- s.grouped(16).zipWithIndex) {
        val r = got((id, c.toLong, win.toLong))
        val zc = w.indices.tail.count(i => (w(i - 1) < 0) != (w(i) < 0))
        assert(r.getLong(3) == w.size.toLong, s"n_w doc $id ch $c win $win")
        assert(r.getLong(4) == w.map(v => v.toLong * v).sum, s"energy doc $id ch $c win $win")
        assert(r.getLong(5) == zc.toLong, s"zc doc $id ch $c win $win")
        assert(r.getLong(6) == w.map(v => math.abs(v).toLong).max, s"peak doc $id ch $c win $win")
        if (w.size < 16) partialSeen += 1
      }
    }
    assert(partialSeen > 0, "corpus produced no partial trailing window — edge path untested")
  }

  test("featuresWindowed never counts a crossing across a window boundary") {
    // Alternating-sign signal: every consecutive pair crosses. 8 frames at
    // window 4 ⇒ 3 crossings per window (not 7 total) — the boundary pair
    // (i=3→4) must NOT be counted.
    val frames = 8; val rate = 8000; val blockAlign = 2
    val dataLen = frames * blockAlign
    val total = 12 + (8 + 16) + (8 + dataLen)
    val b = new Array[Byte](total)
    var p = 0
    def putcc(s: String): Unit = { s.foreach { ch => b(p) = ch.toByte; p += 1 } }
    def put16(v: Int): Unit = { b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte; p += 2 }
    def put32(v: Long): Unit = { (0 until 4).foreach(k => b(p + k) = ((v >> (8 * k)) & 0xff).toByte); p += 4 }
    putcc("RIFF"); put32(total - 8); putcc("WAVE")
    putcc("fmt "); put32(16); put16(1); put16(1); put32(rate); put32(rate.toLong * blockAlign)
    put16(blockAlign); put16(16)
    putcc("data"); put32(dataLen)
    (0 until frames).foreach(i => put16(if (i % 2 == 0) 100 else -100 & 0xffff))
    val df = spark.createDataFrame(Seq((5L, b))).toDF("doc_id", "payload")
    val rows = WavCodec.featuresWindowed(df, window = 4).collect()
      .map(r => r.getLong(2) -> r).toMap
    assert(rows.size == 2)
    rows.values.foreach { r =>
      assert(r.getLong(3) == 4 && r.getLong(5) == 3 && r.getLong(6) == 100,
        s"window features wrong: $r")
    }
  }
}
