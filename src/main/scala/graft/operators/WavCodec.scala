package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL audio decode in the typed codec slot — the WAV/RIFF twin of
  * [[MultimodalCodec.decodePpm]] (builder brief: image/AUDIO/video as
  * opaque BINARY + typed metadata, decode as a partition-parallel batch
  * step).
  *
  * The parser implements the public RIFF/WAVE container grammar
  * (Microsoft/IBM 1991 multimedia file format spec): `RIFF` + u32le
  * payload size + `WAVE`, then a CHUNK WALK — each chunk is a 4-byte
  * ASCII id + u32le size + body, with an odd-sized body padded to an
  * even boundary (the RIFF word-alignment rule real writers rely on and
  * naive parsers get wrong). Unknown chunks (`LIST`, `JUNK`, `fact`,
  * vendor extensions) are SKIPPED, not errors — a real-world WAV carries
  * them routinely, so the synthetic gate payloads plant one in front of
  * `fmt ` (odd-sized for half the docs) to keep the skip + pad paths
  * load-bearing. `fmt ` must declare integer PCM (format tag 1) at
  * 16 bits/sample with self-consistent byteRate/blockAlign; `data` must
  * hold a whole number of frames. Malformed or truncated input throws —
  * a decode error must fail the task, not fabricate samples.
  *
  * Scale shape: identical to the PPM path — one decoder loop per
  * partition via typed mapPartitions, no shuffle; the per-channel output
  * rows explode inside the same pass (channels ≤ 2), so at 100 TB the
  * cost is the payload scan itself.
  */
object WavCodec {

  /** Parsed container facts: geometry of the PCM payload. */
  final case class WavHeader(channels: Int, sampleRate: Int, dataOffset: Int, nFrames: Int)

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 3) & 0xffL) << 24)

  /** Signed 16-bit little-endian sample. */
  private def s16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) | (b(p + 1) << 8)).toShort.toInt

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Parse the RIFF/WAVE container down to the PCM frame table. Only
    * 16-bit integer PCM (format tag 1, the original uncompressed WAV
    * encoding) is supported; anything else throws. */
  def parseWavHeader(b: Array[Byte]): WavHeader = {
    require(b.length >= 12 && fourcc(b, 0) == "RIFF", "not a RIFF payload")
    val riffSize = u32(b, 4)
    require(riffSize == b.length - 8,
      s"RIFF size $riffSize != payload ${b.length - 8}")
    require(fourcc(b, 8) == "WAVE", "RIFF form is not WAVE")
    var pos = 12
    var channels = 0; var rate = 0; var blockAlign = 0; var haveFmt = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length && dataOff < 0) {
      val id = fourcc(b, pos)
      val size = u32(b, pos + 4)
      require(size <= b.length - pos - 8,
        s"chunk $id truncated: declares $size, have ${b.length - pos - 8}")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          val body = pos + 8
          val tag = u16(b, body)
          require(tag == 1, s"format tag $tag unsupported (integer PCM only)")
          channels = u16(b, body + 2)
          rate = u32(b, body + 4).toInt
          val byteRate = u32(b, body + 8)
          blockAlign = u16(b, body + 12)
          val bits = u16(b, body + 14)
          require(bits == 16, s"$bits bits/sample unsupported (16 only)")
          require(channels >= 1 && channels <= 2, s"$channels channels unsupported")
          require(blockAlign == channels * 2,
            s"blockAlign $blockAlign != channels*2 (${channels * 2})")
          require(byteRate == rate.toLong * blockAlign,
            s"byteRate $byteRate != rate*blockAlign (${rate.toLong * blockAlign})")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt chunk")
          dataOff = pos + 8
          dataLen = size.toInt
        case _ => () // LIST/JUNK/fact/vendor chunks: skip per the RIFF spec
      }
      // RIFF word alignment: an odd-sized body is followed by a pad byte.
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    require(dataOff >= 0, "no data chunk")
    require(dataLen % blockAlign == 0,
      s"data length $dataLen is not a whole number of $blockAlign-byte frames")
    WavHeader(channels, rate, dataOff, dataLen / blockAlign)
  }

  /** The decoder: parse each payload's container, then emit one row of
    * integer sample statistics PER CHANNEL — frame count, sample sum,
    * min/max peak, and the position-weighted checksum Σ s(i)·(i+1)
    * (catches channel-swapped or frame-shifted reads that plain sums
    * miss). `media` must carry (doc_id, payload BINARY). */
  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val h = parseWavHeader(payload)
          (0 until h.channels).map { c =>
            var sum = 0L; var wsum = 0L
            var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < h.nFrames) {
              val s = s16(payload, h.dataOffset + (i * h.channels + c) * 2)
              sum += s; wsum += s.toLong * (i + 1)
              if (s < mn) mn = s
              if (s > mx) mx = s
              i += 1
            }
            (id, c.toLong, h.sampleRate.toLong, h.nFrames.toLong,
              sum, mn.toLong, mx.toLong, wsum)
          }
        }
      }
      .toDF("doc_id", "channel", "sample_rate", "n_frames",
        "sum_s", "min_s", "max_s", "wsum")
  }

  /** AUDIO FEATURE EXTRACTION in the typed codec slot (builder brief:
    * "feature-extract" as a first-class multimodal op, completing the
    * decode / resize / frame-sample / feature-extract quartet): the
    * classic frame-level audio features — per fixed `window`-frame
    * span of each channel, the signal ENERGY Σ s², the ZERO-CROSSING
    * count (sign flips between consecutive samples WITHIN the window —
    * the boundary pair straddling two windows is deliberately not
    * counted, so windows are independently computable), and the PEAK
    * max |s|. The trailing window may be partial; its true frame count
    * is emitted so downstream normalization (energy/n, zc-rate) stays
    * exact. All-integer arithmetic — a 16-bit sample squares below
    * 2³⁰, so energy stays in Long for any window under 2³³ frames —
    * which is what makes the closed-form DuckDB twin possible (qx52
    * re-derives every window from the sample generator via `lag`; a
    * sign-extension error, a window-boundary crossing miscount or a
    * channel transpose breaks the hash).
    * Scale shape: identical to [[decodeWav]] — partition-parallel
    * mapPartitions, no shuffle; the windowed rows explode inside the
    * same pass, cost = the payload scan plus one multiply per sample. */
  def featuresWindowed(media: DataFrame, window: Int): DataFrame = {
    require(window >= 2, s"window $window must be >= 2")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val h = parseWavHeader(payload)
          (0 until h.channels).flatMap { c =>
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long, Long, Long, Long)]
            var win = 0
            var n = 0; var energy = 0L; var zc = 0L; var peak = 0L
            var prev = 0 // sample i-1 within the current window
            var i = 0
            while (i < h.nFrames) {
              val s = s16(payload, h.dataOffset + (i * h.channels + c) * 2)
              energy += s.toLong * s
              if (n > 0 && ((prev < 0) != (s < 0))) zc += 1
              val a = math.abs(s).toLong
              if (a > peak) peak = a
              prev = s
              n += 1
              if (n == window) {
                out += ((id, c.toLong, win.toLong, n.toLong, energy, zc, peak))
                win += 1; n = 0; energy = 0L; zc = 0L; peak = 0L
              }
              i += 1
            }
            if (n > 0)
              out += ((id, c.toLong, win.toLong, n.toLong, energy, zc, peak))
            out
          }
        }
      }
      .toDF("doc_id", "channel", "win", "n_w", "energy", "zc", "peak")
  }

  /** Deterministic synthetic WAV for `docId` — REAL bytes in the REAL
    * container: RIFF/WAVE, then a JUNK chunk (odd-sized when docId is
    * odd, so the word-alignment pad is exercised on half the corpus),
    * then canonical fmt and data chunks. Sample for frame i, channel c
    * is ((docId·37 + i·13 + c·101 + 7) mod 4001) − 2000 — the closed
    * form the DuckDB twin re-derives without parsing. Channel count,
    * frame count and sample rate all vary with docId so the fmt fields
    * are load-bearing across shapes. */
  def syntheticWav(docId: Long): Array[Byte] = syntheticWav(docId, 1)

  /** `gain` scales every sample (a volume change — ×2 stays within
    * 16-bit range for this corpus); container geometry derives from
    * `docId` alone, so a gained payload is a bit-level DIFFERENT file
    * with the same perceptual content (qx76's planted twins). */
  def syntheticWav(docId: Long, gain: Int): Array[Byte] = {
    val channels = 1 + (docId % 2).toInt
    val frames = (40 + (docId % 9) * 5).toInt
    val rate = 8000 + (docId % 3).toInt * 4000
    val junkLen = 5 + (docId % 2).toInt // 5 (odd → padded) or 6
    val blockAlign = channels * 2
    val dataLen = frames * blockAlign
    val junkPadded = junkLen + (junkLen & 1)
    val total = 12 + (8 + junkPadded) + (8 + 16) + (8 + dataLen)
    val b = new Array[Byte](total)
    var p = 0
    def putcc(s: String): Unit = { var i = 0; while (i < 4) { b(p) = s.charAt(i).toByte; p += 1; i += 1 } }
    def put16(v: Int): Unit = { b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte; p += 2 }
    def put32(v: Long): Unit = {
      b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
      b(p + 2) = ((v >> 16) & 0xff).toByte; b(p + 3) = ((v >> 24) & 0xff).toByte; p += 4
    }
    putcc("RIFF"); put32(total - 8); putcc("WAVE")
    putcc("JUNK"); put32(junkLen)
    var j = 0
    while (j < junkLen) { b(p) = ((docId + j) % 251).toByte; p += 1; j += 1 }
    p += junkLen & 1 // pad byte (zero) after an odd-sized body
    putcc("fmt "); put32(16)
    put16(1); put16(channels); put32(rate); put32(rate.toLong * blockAlign)
    put16(blockAlign); put16(16)
    putcc("data"); put32(dataLen)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val s = (((docId * 37 + i * 13 + c * 101 + 7) % 4001).toInt - 2000) * gain
        b(p) = (s & 0xff).toByte; b(p + 1) = ((s >> 8) & 0xff).toByte; p += 2
        c += 1
      }
      i += 1
    }
    b
  }
}
