package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.operators.SimHashLsh

/** Streaming SimHash near-duplicate detection — the ONLINE flavor of the
  * qx14 batch miner: as documents stream in, each is checked against the
  * already-seen corpus and near-dup pairs are emitted the moment the
  * second member arrives. This is the shape a live training-data intake
  * runs (dedup each incoming crawl shard against everything kept so far)
  * where the batch miner is the backfill pass.
  *
  * Same math as [[SimHashLsh]], re-derived per document in one typed pass
  * (see [[NearDupStream.docSigs]] — pinned bit-identical to the batch
  * operator by NearDupStreamSpec), then keyed state does what the batch
  * band self-join does:
  *
  *  - each doc emits one row per band, keyed by (band, full band sig) —
  *    the SAME corpus-sized bucket key as the batch miner, so candidate
  *    work per arriving doc is bounded by bucket occupancy at every
  *    corpus size, and recall for Hamming ≤ 3 is total by the pigeonhole
  *    argument (4 disjoint bands);
  *  - per-bucket [[ListState]] holds the members' (doc_id, 4 band sigs);
  *    an arriving doc Hamming-verifies against list members only — never
  *    the corpus — emits matches, and appends itself;
  *  - an optional TTL bounds state to a retention horizon (the streaming
  *    dedup-with-TTL contract, F10) — "near-dup within the last N days",
  *    the usual production semantics — and [[DefaultMaxOccupancy]] caps
  *    each bucket's member list, so neither time nor a boilerplate band
  *    signature can grow a bucket (or its per-arrival verify cost)
  *    without bound.
  *
  * A pair colliding in ≥2 bands emits once per colliding band (the batch
  * miner collapses these with a `distinct()`); downstream either
  * tolerates duplicates (idempotent kill-lists do) or applies streaming
  * `dropDuplicates` — the emission itself is deterministic, so the spec
  * compares the distinct match set against the batch miner exactly.
  *
  * The fingerprint width must be sized for the EXPECTED corpus
  * (`SimHashLsh.bandWidthFor(n)`): a stream cannot count its corpus up
  * front, so sizing is an explicit capacity decision here, exactly like
  * choosing shuffle partitions for the batch job.
  */
object NearDupStream {

  /** Default bucket-occupancy cap (round-6 verdict #2 — the streaming
    * twin of qx17's boilerplate-frequency cap). A band bucket holding
    * thousands of members is a boilerplate signature (license headers,
    * templated pages), not a near-dup cluster worth enumerating: its
    * pair set is quadratic noise, and verifying every arrival against an
    * unbounded member list is exactly the skew hazard the batch miner
    * caps. Beyond the cap, arrivals still VERIFY against the stored
    * members (so boilerplate keeps getting flagged against the retained
    * exemplars — work bounded by the cap) but stop being stored, and the
    * bucket counts its overflow in a `ValueState` readable offline via
    * the statestore source (the F11 pattern). Below the cap, semantics
    * are byte-identical to the uncapped/batch behavior. */
  val DefaultMaxOccupancy = 4096

  /** A document on the wire. */
  case class DocText(doc_id: Long, text: String)

  /** One (bucket, doc) row; `sigs` carries ALL band sigs for the exact
    * Hamming verify. `bucket` = band << 32 | sig (sig < 2³⁰ < 2³²). */
  case class DocBandRow(bucket: Long, doc_id: Long,
                        s0: Long, s1: Long, s2: Long, s3: Long)

  /** Stored bucket member — same fields minus the key. */
  case class Member(doc_id: Long, s0: Long, s1: Long, s2: Long, s3: Long)

  /** An emitted near-dup pair, `doc_a` < `doc_b`, batch-identical schema. */
  case class NearDupMatch(doc_a: Long, doc_b: Long, hamming: Long)

  /** The typed twin of [[SimHashLsh.bandSigs]]: all `bands` band sigs of
    * one document in a single pass over its characters. Exactly the SQL
    * chain — whitespace split, non-empty filter, per-word Horner fold
    * `(a·31 + ascii(c)) mod 1000003` (multiset semantics: repeated words
    * vote repeatedly), vote for global bit g by the parity of
    * `(x·31 + g·97 + 11)² mod (2³¹−1)` (exact: h < 3.2e7 ⇒ h² < 2⁶³),
    * bit set iff votes sum positive. The batch side spells this as 120
    * conditional-sum columns because it aggregates ACROSS rows; here the
    * whole document is one value, so a typed loop is the idiomatic (and
    * allocation-free) spelling. NearDupStreamSpec pins bit-identity
    * against the batch operator on real documents. */
  def docSigs(text: String, bits: Int, bands: Int = SimHashLsh.Bands): Array[Long] = {
    require(bits >= SimHashLsh.MinBandWidth && bits <= SimHashLsh.MaxKeyBits,
      s"bits must lie in [${SimHashLsh.MinBandWidth}, ${SimHashLsh.MaxKeyBits}]")
    val width = bands * bits
    val votes = new Array[Long](width)
    for (w <- text.split(" ") if w.nonEmpty) {
      var x = 0L
      var i = 0
      while (i < w.length) { x = (x * 31 + w.charAt(i).toLong) % 1000003; i += 1 }
      var g = 0
      while (g < width) {
        val h = x * 31 + g * 97 + 11
        votes(g) += (if (h * h % 2147483647L % 2 == 0) 1L else -1L)
        g += 1
      }
    }
    Array.tabulate(bands) { b =>
      var sig = 0L
      var i = 0
      while (i < bits) { if (votes(b * bits + i) > 0) sig |= 1L << i; i += 1 }
      sig
    }
  }

  /** Per-bucket matcher: verify the arriving doc against stored members
    * (exact Hamming over all bands), emit pairs ≤ `maxHamming`, append.
    * Re-delivered doc_ids are ignored — at-least-once upstream delivery
    * must not self-pair or double-store. A bucket at `maxOccupancy`
    * stops storing (arrivals still verify against the retained members)
    * and counts the skipped appends in the `overflow` ValueState — see
    * [[DefaultMaxOccupancy]] for the degradation contract. */
  class NearDupProcessor(maxHamming: Int, ttl: Option[java.time.Duration],
                         maxOccupancy: Int = DefaultMaxOccupancy)
      extends StatefulProcessor[Long, DocBandRow, NearDupMatch] {
    @transient private var members: ListState[Member] = _
    @transient private var overflow: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Member]("members", Encoders.product[Member],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
      overflow = getHandle.getValueState[Long]("overflow", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[DocBandRow],
                                 tv: TimerValues): Iterator[NearDupMatch] = {
      val seen = scala.collection.mutable.ArrayBuffer.from(members.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupMatch]
      var skipped = 0L
      rows.foreach { r =>
        if (!seen.exists(_.doc_id == r.doc_id)) {
          seen.foreach { m =>
            val hamming = java.lang.Long.bitCount(m.s0 ^ r.s0) + java.lang.Long.bitCount(m.s1 ^ r.s1) +
              java.lang.Long.bitCount(m.s2 ^ r.s2) + java.lang.Long.bitCount(m.s3 ^ r.s3)
            if (hamming <= maxHamming)
              out += NearDupMatch(math.min(m.doc_id, r.doc_id), math.max(m.doc_id, r.doc_id), hamming.toLong)
          }
          if (seen.size < maxOccupancy) {
            val me = Member(r.doc_id, r.s0, r.s1, r.s2, r.s3)
            seen += me
            members.appendValue(me)
          } else skipped += 1
        }
      }
      if (skipped > 0)
        overflow.update((if (overflow.exists) overflow.get else 0L) + skipped)
      out.iterator
    }
  }

  /** The pipeline: documents → per-band bucket rows (typed map, no
    * shuffle) → one keyed-state shuffle on the bucket → matches. The only
    * exchange carries (bucket, doc_id, 4 longs) — the streaming analogue
    * of the batch miner's single (band, sig) exchange.
    *
    * `distinctPairs = true` (round-5 verdict #5) appends a streaming
    * `dropDuplicates(doc_a, doc_b)` so the batch miner's distinct pair
    * set is available ON the stream, not only after a batch post-pass: a
    * pair colliding in ≥2 bands otherwise emits once per colliding band.
    * Cost: a second keyed state store holding one entry per DISTINCT
    * emitted pair — bounded by the true near-dup count, not the corpus,
    * but unbounded in time (TimeMode.None has no watermark to expire
    * it); pair TTL, when needed, follows the bucket-member `ttl`. */
  def nearDupMatches(docs: Dataset[DocText], bits: Int,
                     maxHamming: Int = SimHashLsh.HammingRadius,
                     ttl: Option[java.time.Duration] = None,
                     distinctPairs: Boolean = false,
                     maxOccupancy: Int = DefaultMaxOccupancy): Dataset[NearDupMatch] = {
    require(maxHamming <= SimHashLsh.Bands - 1, "pigeonhole guarantee needs maxHamming <= bands - 1")
    require(maxOccupancy >= 1, "maxOccupancy must be >= 1")
    implicit val rowEnc = Encoders.product[DocBandRow]
    implicit val outEnc = Encoders.product[NearDupMatch]
    val matches = docs.flatMap { d =>
      val sigs = docSigs(d.text, bits)
      (0 until SimHashLsh.Bands).map(b =>
        DocBandRow((b.toLong << 32) | sigs(b), d.doc_id, sigs(0), sigs(1), sigs(2), sigs(3)))
    }
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .transformWithState(new NearDupProcessor(maxHamming, ttl, maxOccupancy),
        TimeMode.None(), OutputMode.Update())
    // A pair's hamming is exact over ALL bands, so every multi-band
    // emission of (doc_a, doc_b) is byte-identical — dedup on the pair
    // key alone is lossless.
    if (distinctPairs) matches.dropDuplicates("doc_a", "doc_b") else matches
  }
}
