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

  // --- the REAL decoder (P6 PPM) -------------------------------------

  /** 2×1 image, pixels (1,2,3) and (250,251,252). */
  private val tinyPixels = Array(1, 2, 3, 250, 251, 252).map(_.toByte)

  private def ppm(header: String): Array[Byte] =
    header.getBytes("US-ASCII") ++ tinyPixels

  test("parsePpmHeader handles the full header grammar") {
    // Canonical, comment lines, CRLF/tab separators, multi-digit fields.
    for (h <- Seq("P6\n2 1\n255\n", "P6\n# a comment\n2 1\n# another\n255\n",
                  "P6\r\n2\t1\r\n255 ", "P6 2 1 255\n")) {
      val hdr = MultimodalCodec.parsePpmHeader(ppm(h))
      assert(hdr.width == 2 && hdr.height == 1 && hdr.maxval == 255, s"header <$h>")
      assert(ppm(h)(hdr.dataOffset) == 1.toByte, s"wrong data offset for <$h>")
    }
    val wide = "P6\n120 1\n255\n".getBytes("US-ASCII") ++ Array.fill(360)(9.toByte)
    assert(MultimodalCodec.parsePpmHeader(wide).width == 120)
  }

  test("parsePpmHeader rejects malformed payloads instead of fabricating") {
    val bad = Seq(
      "P5\n2 1\n255\n".getBytes("US-ASCII") ++ tinyPixels, // wrong magic
      "P6\n2 1\n255\n".getBytes("US-ASCII") ++ tinyPixels.take(5), // truncated
      "P6\n2 1\n65535\n".getBytes("US-ASCII") ++ tinyPixels, // 2-byte samples
      "P6\n2 0\n255\n".getBytes("US-ASCII"), // degenerate geometry
      "P6\n\n255\n".getBytes("US-ASCII")) // missing fields
    for (b <- bad)
      assertThrows[IllegalArgumentException](MultimodalCodec.parsePpmHeader(b))
  }

  test("decodePpm: first pixel byte that LOOKS like whitespace is data") {
    // The spec's one-whitespace-after-maxval rule: pixel r=10 ('\n')
    // must be read as a sample, not skipped.
    val payload = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 32, 9)
    val df = spark.createDataFrame(Seq((1L, payload))).toDF("doc_id", "payload")
    val r = MultimodalCodec.decodePpm(df).head()
    assert(r.getLong(5) == 10L && r.getLong(6) == 32L && r.getLong(7) == 9L,
      s"whitespace-valued pixels misread: $r")
  }

  test("decodePpm stats match the closed form on the synthetic corpus") {
    // The qx47 gate in miniature, locally assertable: generate real
    // bytes, decode them, compare against the generator formula.
    val ids = (0L until 200L)
    val df = spark.createDataFrame(ids.map(id => (id, MultimodalCodec.syntheticPpm(id))))
      .toDF("doc_id", "payload")
    val got = MultimodalCodec.decodePpm(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 3).toInt
      val v = (0 until 3 * w * h).map(b => (id * 31 + b * 7 + 11) % 256)
      val r = got(id)
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == 255L &&
        r.getLong(4) == w.toLong * h, s"geometry wrong for doc $id: $r")
      assert(r.getLong(5) == v.indices.collect { case b if b % 3 == 0 => v(b) }.sum &&
        r.getLong(6) == v.indices.collect { case b if b % 3 == 1 => v(b) }.sum &&
        r.getLong(7) == v.indices.collect { case b if b % 3 == 2 => v(b) }.sum,
        s"channel sums wrong for doc $id")
      assert(r.getLong(8) == v.indices.map(b => v(b) * (b + 1)).sum,
        s"weighted checksum wrong for doc $id")
    }
  }

  // --- box-filter resize (qx51) ---------------------------------------

  test("decodeResized factor 1 is the identity: stats equal decodePpm's") {
    val ids = (0L until 60L)
    val df = spark.createDataFrame(ids.map(id => (id, MultimodalCodec.syntheticPpm(id))))
      .toDF("doc_id", "payload")
    val full = MultimodalCodec.decodePpm(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val same = MultimodalCodec.decodeResized(df, factor = 1).collect()
    same.foreach { r =>
      val f = full(r.getLong(0))
      // factor 1 ⇒ every block is one pixel ⇒ rv = v and positions match,
      // so channel sums AND the raster checksum are bit-identical.
      assert(r.getLong(1) == f.getLong(1) && r.getLong(2) == f.getLong(2),
        s"factor-1 geometry drifted for doc ${r.getLong(0)}")
      assert(r.getLong(3) == f.getLong(5) && r.getLong(4) == f.getLong(6) &&
        r.getLong(5) == f.getLong(7) && r.getLong(6) == f.getLong(8),
        s"factor-1 stats drifted for doc ${r.getLong(0)}")
    }
  }

  test("decodeResized handles partial edge blocks exactly (hand case)") {
    // 3×3 single-image: factor 2 ⇒ out 2×2 with blocks of 4/2/2/1 pixels.
    val w = 3; val h = 3
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(3 * w * h)(b => (b * 5 % 256).toByte)
    val payload = header ++ px
    val df = spark.createDataFrame(Seq((7L, payload))).toDF("doc_id", "payload")
    val r = MultimodalCodec.decodeResized(df, factor = 2).collect().head
    def v(x: Int, y: Int, c: Int) = (px(3 * (y * w + x) + c) & 0xff).toLong
    def blk(xs: Seq[(Int, Int)], c: Int) = xs.map { case (x, y) => v(x, y, c) }.sum / xs.size
    val blocks = Seq(
      Seq((0, 0), (1, 0), (0, 1), (1, 1)), // full 2×2
      Seq((2, 0), (2, 1)),                 // right edge 1×2
      Seq((0, 2), (1, 2)),                 // bottom edge 2×1
      Seq((2, 2)))                         // corner 1×1
    val expSums = (0 until 3).map(c => blocks.map(b => blk(b, c)).sum)
    val expW = (for ((b, p) <- blocks.zipWithIndex; c <- 0 until 3)
      yield blk(b, c) * (3 * p + c + 1)).sum
    assert(r.getLong(1) == 2 && r.getLong(2) == 2, s"geometry: $r")
    assert(r.getLong(3) == expSums(0) && r.getLong(4) == expSums(1) &&
      r.getLong(5) == expSums(2), s"edge-block sums: $r vs $expSums")
    assert(r.getLong(6) == expW, s"raster checksum: ${r.getLong(6)} vs $expW")
  }

  // --- per-channel histograms (qx57) ----------------------------------

  test("histogramPpm bins every pixel once, sparsely, per channel") {
    val ids = (0L until 60L)
    val df = spark.createDataFrame(ids.map(id => (id, MultimodalCodec.syntheticPpm(id))))
      .toDF("doc_id", "payload")
    val rows = MultimodalCodec.histogramPpm(df, bins = 8).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    for (id <- ids) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 3).toInt
      val expected = (0 until 3 * w * h)
        .map(b => (b % 3, ((id * 31 + b * 7 + 11) % 256).toInt / 32))
        .groupBy(identity).map { case ((c, bin), xs) => (c.toLong, bin.toLong) -> xs.size.toLong }
      val got = byDoc(id).map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(got == expected, s"histogram wrong for doc $id")
      // Sparse: every emitted bin is non-zero, and totals tile the image.
      assert(got.values.forall(_ > 0) &&
        (0L until 3L).forall(c => got.collect { case ((`c`, _), n) => n }.sum == w * h))
    }
  }

  // --- frame sampling over concatenated-PPM streams (qx49) -----------

  test("decodeFrameSampled walks every boundary, decodes every stride-th frame") {
    val ids = (0L until 60L)
    val df = spark.createDataFrame(ids.map(id => (id, MultimodalCodec.syntheticVideo(id))))
      .toDF("doc_id", "payload")
    val got = MultimodalCodec.decodeFrameSampled(df, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    for (id <- ids) {
      val frames = (4 + id % 4).toInt
      val sampled = (0 until frames).filter(_ % 2 == 0)
      assert(got.keys.count(_._1 == id) == sampled.size,
        s"doc $id: expected frames ${sampled.mkString(",")}")
      for (f <- sampled) {
        val w = (4 + id % 5).toInt; val h = (3 + id % 3).toInt
        val v = (0 until 3 * w * h).map(b => (id * 31 + f * 17 + b * 7 + 11) % 256)
        val r = got((id, f.toLong))
        assert(r.getLong(2) == w && r.getLong(3) == h, s"geometry wrong for $id/$f")
        assert(r.getLong(7) == v.indices.map(b => v(b) * (b + 1)).sum,
          s"frame $f of doc $id decoded from the wrong offset")
      }
    }
  }

  test("decodeFrameSampled stride 1 decodes all frames; stride n samples exactly") {
    val df = spark.createDataFrame(Seq((5L, MultimodalCodec.syntheticVideo(5L))))
      .toDF("doc_id", "payload")
    val frames = (4 + 5 % 4).toInt
    assert(MultimodalCodec.decodeFrameSampled(df, 1).count() == frames.toLong)
    assert(MultimodalCodec.decodeFrameSampled(df, 3).count() ==
      (0 until frames).count(_ % 3 == 0).toLong)
  }

  test("decodeFrameSampled throws on a desynchronized stream") {
    // Drop one byte mid-stream: the walk must fail loudly at the next
    // boundary, not emit garbage frames.
    val good = MultimodalCodec.syntheticVideo(3L)
    val broken = good.take(40) ++ good.drop(41)
    val df = spark.createDataFrame(Seq((3L, broken))).toDF("doc_id", "payload")
    assertThrows[org.apache.spark.SparkException](
      MultimodalCodec.decodeFrameSampled(df, 2).collect())
  }
}
