package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The multimodal decode boundary (builder brief: image/audio/video as
  * opaque BINARY + typed metadata, decode as a partition-parallel batch
  * step; this container ships no codecs, so the decode itself is a
  * deterministic stub).
  *
  * Two renderings of the same contract, proven equivalent by
  * MultimodalCodecSpec:
  *
  *  - [[decodeColumnar]] — the stub's outputs (payload length, first
  *    byte) ARE computable relationally, so the default path keeps them
  *    as codegen'd Catalyst expressions: no typed deserialization, the
  *    whole plan stays inside WholeStageCodegen (round-2 verdict #4: the
  *    row-at-a-time typed deser made qx11 the slowest query at 7.45 s for
  *    pure plumbing reasons).
  *  - [[decodeTyped]] — the escape hatch a REAL codec needs: a typed
  *    mapPartitions over (id, type, k, payload) where a JNI/FFM decoder
  *    would process the partition's payloads batch-wise (one codec
  *    instance per partition, amortized init — the mapInPandas shape of
  *    the brief, rendered JVM-native). This costs one
  *    deserialize/serialize fence around the decode — the price of
  *    leaving Catalyst, paid only when real out-of-engine work happens.
  */
object MultimodalCodec {

  /** media must carry (event_id, event_type, k, payload BINARY); appends
    * payload_len + first_byte without leaving codegen. */
  def decodeColumnar(media: DataFrame): DataFrame =
    media
      .withColumn("payload_len", length(col("payload")).cast("long"))
      // First byte as unsigned int: 1-byte binary slice → hex → base-16.
      .withColumn("first_byte", expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS BIGINT)"))
      .drop("payload")

  /** Same contract through the typed codec slot ([[decodePpm]] is the
    * REAL decoder in this slot — this twin keeps qx11's columnar-equal
    * contract). */
  def decodeTyped(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("event_id"), col("event_type"), col("k"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        // DECODE STUB — deterministic fake: a real implementation would
        // decode image/audio here (batch-wise, one codec per partition).
        rows.map { case (id, tpe, k, payload) =>
          (id, tpe, k, payload.length.toLong, (payload(0) & 0xff).toLong)
        }
      }
      .toDF("event_id", "event_type", "k", "payload_len", "first_byte")
  }

  /** Parsed P6 header: image geometry + the byte offset where the raw
    * RGB triples begin. */
  final case class PpmHeader(width: Int, height: Int, maxval: Int, dataOffset: Int)

  /** Parse a binary (P6) PPM header — the real public format, per the
    * netpbm spec: magic `P6`, then width, height, maxval as ASCII
    * decimals separated by whitespace, with `#`-to-end-of-line comments
    * allowed anywhere a separator is, and exactly ONE whitespace byte
    * between maxval and the pixel data (a pixel byte may itself look
    * like whitespace, so the spec forbids skipping more). Only
    * 1-byte-per-sample images (maxval < 256) are supported; malformed
    * or truncated input throws — a decode error must fail the task, not
    * fabricate pixels. */
  def parsePpmHeader(b: Array[Byte], start: Int = 0): PpmHeader = {
    require(b.length >= start + 2 && b(start) == 'P' && b(start + 1) == '6',
      "not a P6 PPM payload")
    var pos = start + 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def readInt(): Int = {
      var skipping = true
      while (skipping) {
        while (pos < b.length && isWs(b(pos))) pos += 1
        if (pos < b.length && b(pos) == '#') {
          while (pos < b.length && b(pos) != '\n') pos += 1
        } else skipping = false
      }
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"PPM header: digit expected at byte $pos")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val m = readInt()
    require(pos < b.length && isWs(b(pos)), "PPM header: whitespace expected after maxval")
    pos += 1
    require(w > 0 && h > 0, s"PPM header: degenerate geometry ${w}x$h")
    require(m > 0 && m < 256, s"PPM maxval $m unsupported (1 byte/sample only)")
    require(b.length - pos >= 3 * w * h,
      s"PPM truncated: need ${3 * w * h} pixel bytes, have ${b.length - pos}")
    PpmHeader(w, h, m, pos)
  }

  /** The REAL decoder in the typed codec slot (round-6 verdict #3):
    * parse each payload as a P6 PPM and emit integer pixel statistics —
    * geometry, per-channel sums, and a position-weighted checksum
    * Σ v(b)·(b+1) that catches transposed/offset reads a plain sum
    * would miss. All-integer output ⇒ an EXACT oracle twin exists
    * (qx47 re-derives the stats closed-form from the synthetic
    * generator — the decode chain is verified on real bytes end to
    * end). Partition-parallel mapPartitions, one decoder loop per
    * partition, no shuffle: at 100 TB this is an embarrassingly
    * parallel scan whose cost is the payload bytes themselves.
    * `media` must carry (doc_id, payload BINARY). */
  def decodePpm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val hdr = parsePpmHeader(payload)
          var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
          val n = 3 * hdr.width * hdr.height
          var b = 0
          while (b < n) {
            val v = (payload(hdr.dataOffset + b) & 0xff).toLong
            (b % 3: @annotation.switch) match {
              case 0 => sr += v
              case 1 => sg += v
              case 2 => sb += v
            }
            wsum += v * (b + 1)
            b += 1
          }
          (id, hdr.width.toLong, hdr.height.toLong, hdr.maxval.toLong,
            hdr.width.toLong * hdr.height, sr, sg, sb, wsum)
        }
      }
      .toDF("doc_id", "width", "height", "maxval", "n_pixels",
        "sum_r", "sum_g", "sum_b", "wsum")
  }

  /** IMAGE RESIZE in the typed codec slot (builder brief: "resize" as a
    * first-class multimodal op): box-filter downsample by an integer
    * `factor` — output pixel (ox, oy) is the integer-floor mean of the
    * factor×factor input block it covers, with PARTIAL edge blocks
    * (odd-width/height images) averaged over their true pixel count, so
    * out_w = ceil(w/factor), out_h = ceil(h/factor) and no input pixel
    * is dropped. All arithmetic is exact-integer (block sums then one
    * floor division), which is what makes a closed-form DuckDB twin
    * possible (qx51 re-derives every resized pixel from the generator
    * formula — a misplaced block boundary, a dropped edge pixel or a
    * channel transpose breaks the hash). Emits the resized image's
    * per-channel sums and the position-weighted checksum
    * Σ rv(p)·(p+1) over RESIZED pixel positions p = 3·(oy·out_w+ox)+c,
    * pinning the output raster order.
    * Scale shape: identical to [[decodePpm]] — partition-parallel
    * mapPartitions, no shuffle, cost = the payload scan; the resize
    * itself is one extra integer pass over out_w·out_h·3 cells. */
  def decodeResized(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor $factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val hdr = parsePpmHeader(payload)
          val w = hdr.width; val h = hdr.height
          val outW = (w + factor - 1) / factor
          val outH = (h + factor - 1) / factor
          val sums = new Array[Long](outW * outH * 3)
          var y = 0
          while (y < h) {
            val oy = y / factor
            var x = 0
            while (x < w) {
              val base = (oy * outW + x / factor) * 3
              var c = 0
              while (c < 3) {
                sums(base + c) += (payload(hdr.dataOffset + 3 * (y * w + x) + c) & 0xff).toLong
                c += 1
              }
              x += 1
            }
            y += 1
          }
          var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
          var oy = 0
          while (oy < outH) {
            val bh = math.min(factor, h - oy * factor)
            var ox = 0
            while (ox < outW) {
              val bw = math.min(factor, w - ox * factor)
              val cnt = (bw * bh).toLong
              var c = 0
              while (c < 3) {
                val rv = sums((oy * outW + ox) * 3 + c) / cnt
                (c: @annotation.switch) match {
                  case 0 => sr += rv
                  case 1 => sg += rv
                  case 2 => sb += rv
                }
                wsum += rv * (3 * (oy * outW + ox) + c + 1)
                c += 1
              }
              ox += 1
            }
            oy += 1
          }
          (id, outW.toLong, outH.toLong, sr, sg, sb, wsum)
        }
      }
      .toDF("doc_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b", "wsum")
  }

  /** IMAGE FEATURE EXTRACTION in the typed codec slot: per-channel
    * intensity HISTOGRAMS over the decoded pixels — the image twin of
    * [[WavCodec.featuresWindowed]]'s audio features, and the canonical
    * compact image descriptor (color-distribution features for quality
    * filters, near-dup prescreens, mixture balancing). `bins` must
    * divide 256; pixel value v lands in bin v / (256/bins). Only
    * NON-EMPTY bins emit a row — the output is the sparse histogram,
    * which is also exactly what a GROUP BY over the pixels produces, so
    * the closed-form DuckDB twin (qx57) meets it row for row.
    * Scale shape: identical to [[decodePpm]] — partition-parallel
    * mapPartitions, no shuffle; the histogram accumulates in one
    * 3·bins-long array per image inside the decode pass. */
  def histogramPpm(media: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1 && 256 % bins == 0, s"bins $bins must divide 256")
    val width = 256 / bins
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val hdr = parsePpmHeader(payload)
          val counts = new Array[Long](3 * bins)
          val n = hdr.width * hdr.height
          var p = 0
          while (p < n) {
            var c = 0
            while (c < 3) {
              val v = payload(hdr.dataOffset + 3 * p + c) & 0xff
              counts(c * bins + v / width) += 1L
              c += 1
            }
            p += 1
          }
          for {
            c <- 0 until 3
            b <- 0 until bins
            if counts(c * bins + b) > 0
          } yield (id, c.toLong, b.toLong, counts(c * bins + b))
        }
      }
      .toDF("doc_id", "channel", "bin", "cnt")
  }

  /** dHash grid geometry: an (HashCols+1) × HashRows grayscale sample
    * grid yields HashCols·HashRows = 56 difference bits — deliberately
    * under 63 so the hash is a plain non-negative BIGINT in BOTH engines
    * (64 bits would need DuckDB HUGEINT on the oracle side). */
  val HashCols = 7
  val HashRows = 8

  /** PERCEPTUAL image hash (dHash — the difference-hash family used for
    * web-scale image dedup, e.g. the LAION pipeline's pHash screen) in
    * the typed codec slot: parse the P6 payload with the REAL decoder,
    * nearest-neighbor sample an 8×8 grayscale grid (gray = (r+g+b)/3,
    * integer division; sample (gx,gy) reads source pixel
    * (gx·w/8, gy·h/8) — pure integer scaling, no float resample), and
    * emit one bit per HORIZONTAL neighbor comparison
    * bit(gy·7+gx) = [gray(gx+1,gy) > gray(gx,gy)] packed little-endian
    * into a 56-bit BIGINT. Gradient direction survives brightness
    * shifts, which is exactly the invariance a perceptual dedup wants.
    * All-integer ⇒ an EXACT closed-form oracle exists (qx58 re-derives
    * every sampled gray value from the generator formula).
    * Partition-parallel mapPartitions, no shuffle — the hash is 8 bytes
    * per image no matter the source size, the property that makes
    * image dedup feasible at 100 TB. `media` carries (doc_id, payload). */
  def decodeDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val cols = HashCols; val rows = HashRows
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val hdr = parsePpmHeader(payload)
          val w = hdr.width; val h = hdr.height
          def gray(gx: Int, gy: Int): Int = {
            val sx = gx * w / (cols + 1)
            val sy = gy * h / rows
            val base = hdr.dataOffset + 3 * (sy * w + sx)
            ((payload(base) & 0xff) + (payload(base + 1) & 0xff) +
              (payload(base + 2) & 0xff)) / 3
          }
          var hash = 0L
          var gy = 0
          while (gy < rows) {
            var gx = 0
            while (gx < cols) {
              if (gray(gx + 1, gy) > gray(gx, gy))
                hash |= 1L << (gy * cols + gx)
              gx += 1
            }
            gy += 1
          }
          (id, hash)
        }
      }
      .toDF("doc_id", "dhash")
  }

  /** VIDEO frame sampling in the typed codec slot (builder brief:
    * "frame-sample" as a first-class multimodal op): the payload is a
    * STREAM of concatenated P6 frames — the real rawvideo interchange
    * format ffmpeg's `image2pipe`/ppm pipe produces, where each frame is
    * a complete PPM and the next begins at the previous one's last pixel
    * byte + 1. The decoder WALKS the stream (every frame's header must
    * parse to find the next boundary — a single misparse desynchronizes
    * every later frame, which is what makes the gate strong), decodes
    * every `stride`-th frame with the real parser, and emits the same
    * integer pixel stats as [[decodePpm]] keyed by (doc_id, frame_idx).
    * Skipped frames cost only a header parse + offset add, the point of
    * stride sampling: decode cost divides by the stride while the walk
    * stays exact. Partition-parallel, shuffle-free, like the other
    * codecs. `media` must carry (doc_id, payload BINARY). */
  def decodeFrameSampled(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride $stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[
            (Long, Long, Long, Long, Long, Long, Long, Long)]
          var off = 0
          var f = 0
          while (off < payload.length) {
            val hdr = parsePpmHeader(payload, off)
            val npx = 3 * hdr.width * hdr.height
            if (f % stride == 0) {
              var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
              var b = 0
              while (b < npx) {
                val v = (payload(hdr.dataOffset + b) & 0xff).toLong
                (b % 3: @annotation.switch) match {
                  case 0 => sr += v
                  case 1 => sg += v
                  case 2 => sb += v
                }
                wsum += v * (b + 1)
                b += 1
              }
              out += ((id, f.toLong, hdr.width.toLong, hdr.height.toLong,
                sr, sg, sb, wsum))
            }
            off = hdr.dataOffset + npx
            f += 1
          }
          out
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum")
  }

  /** Deterministic synthetic frame stream for `docId`: 4 + id%4 complete
    * P6 frames back to back (constant per-doc geometry — a video doesn't
    * change shape mid-stream — but varying ACROSS docs), frame f's pixel
    * byte b = (docId·31 + f·17 + b·7 + 11) mod 256; each frame header
    * carries its own comment line so every boundary re-exercises the
    * full header grammar. */
  def syntheticVideo(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 3).toInt
    val frames = (4 + docId % 4).toInt
    val bufs = (0 until frames).map { f =>
      val header = s"P6\n# frame $f\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * w * h)
      System.arraycopy(header, 0, out, 0, header.length)
      var b = 0
      while (b < 3 * w * h) {
        out(header.length + b) = ((docId * 31 + f * 17 + b * 7 + 11) % 256).toByte
        b += 1
      }
      out
    }
    val total = new Array[Byte](bufs.map(_.length).sum)
    var p = 0
    bufs.foreach { fb => System.arraycopy(fb, 0, total, p, fb.length); p += fb.length }
    total
  }

  /** Deterministic synthetic P6 payload for `docId` — REAL bytes in the
    * REAL format (canonical header plus a `#` comment line, so the gate
    * exercises the comment path too); pixel byte b is
    * (docId·31 + b·7 + 11) mod 256, the closed form the DuckDB twin
    * re-derives without parsing. Geometry varies per doc (w = 4 + id%5,
    * h = 3 + id%3) so header parsing is exercised across shapes. */
  def syntheticPpm(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 3).toInt
    val header = s"P6\n# synthetic $docId\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var b = 0
    while (b < 3 * w * h) {
      out(header.length + b) = ((docId * 31 + b * 7 + 11) % 256).toByte
      b += 1
    }
    out
  }
}
