package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-sized banded SimHash for lexical near-duplicate pair mining —
  * the qx14 backend, and the last fixed-size hash space flagged by the
  * round-3 verdict (the old 4×15-bit layout meant within-band candidate
  * pairs grow ~n²/2¹⁵ past ~1M docs, the same quadratic failure class the
  * round-2 embedding LSH had).
  *
  * Design (the [[EmbeddingLsh.planesFor]] pattern, applied to simhash,
  * with one extra decoupling):
  *
  *  - `Bands` = 4, FIXED: the dup criterion is Hamming distance ≤ 3 over
  *    the full fingerprint, and by pigeonhole 3 bit-differences can ruin
  *    at most 3 of 4 disjoint bands — any true near-dup pair collides in
  *    ≥1 band, so banding never loses recall for the criterion.
  *  - FINGERPRINT width per band = max(15, keyBitsFor(n)): the criterion
  *    keeps the reference 60-bit precision on any corpus (a narrower
  *    fingerprint would make "Hamming ≤ 3" a loose dup test on small
  *    corpora) and WIDENS past n ≈ 1M docs so band buckets can keep
  *    tracking n. Carried as one long PER BAND — never packed into a
  *    single word, so total width is not capped at 64 (up to 4×30 = 120
  *    bits). Hamming = Σ_bands bit_count(sig_a XOR sig_b).
  *  - BUCKET key = the low `keyBitsFor(n)` bits of each band sig, DERIVED:
  *    floor(log2(n / targetOcc)) clamped to [6, 30], so the 2^keyBits
  *    bucket space per band tracks the corpus and candidate pairs stay
  *    ≈ bands · n · occ / 2 — LINEAR in n at any scale (at n = 10⁹ docs:
  *    30-bit keys, ~30 docs per bucket). Projecting the key loses NO
  *    recall: a fully-equal band implies an equal projected key, so the
  *    pigeonhole guarantee is intact; the projection only costs extra
  *    (exactly-Hamming-checked) candidates on small corpora, where they
  *    are cheap by definition.
  *
  * Execution shape: one explode to (word-occurrence, bit) rows — NOT one
  * aggregate column per bit, which would grow the generated code (and
  * Janino compile time) linearly with the derived width — then two
  * map-side-combinable hash aggregations (vote sums per (doc, bit), bit
  * packing per (doc, band)). Every shuffle carries only (doc_id, small
  * ints); generated code size is O(1) in the bit count. The vote hash is
  * the same quadratic-residue parity family as [[EmbeddingLsh]]
  * (x < 1000003, g < 120 ⇒ h² < 10¹⁵ — exact in both engines), so the
  * DuckDB oracle reproduces every signature bit-identically.
  */
object SimHashLsh {

  /** Fixed by the pigeonhole guarantee: HammingRadius + 1 disjoint bands. */
  val Bands = 4
  val HammingRadius = 3

  /** Bucket-key bits per band: floor(log2(n / targetOcc)) clamped to
    * [6, 30]. */
  val MinKeyBits = 6
  val MaxKeyBits = 30
  val TargetOccupancy = 32L

  /** The reference fingerprint band width (60-bit total): fingerprints
    * never get NARROWER than this — the dup criterion's precision floor. */
  val MinBandWidth = 15

  /** Integer-only key-width derivation — must stay in lockstep with the
    * SQL form in [[graft.queries.ExtOracle]]:
    * least(30, greatest(6, length(bin(greatest(n//32, 2))) − 1)). */
  def keyBitsFor(n: Long): Int = {
    val x = math.max(n / TargetOccupancy, 2L)
    val floorLog2 = 63 - java.lang.Long.numberOfLeadingZeros(x)
    math.min(MaxKeyBits, math.max(MinKeyBits, floorLog2))
  }

  /** Fingerprint bits per band: the key width once it passes the 15-bit
    * precision floor (key ≤ width always holds). */
  def bandWidthFor(n: Long): Int = math.max(MinBandWidth, keyBitsFor(n))

  /** Band signatures from word-hash rows. `wordHashes` must carry
    * (`doc_id`, `x`) with one row per word OCCURRENCE (multiset
    * semantics — repeated words vote repeatedly, the classic simhash
    * weighting); returns one (doc_id, band, sig) row per (doc, band).
    *
    * Bit g's vote for hash x is ±1 by the parity of
    * ((x·31 + g·97 + 11)² mod 2³¹−1); bit g of the fingerprint is set iff
    * the votes sum positive. Band (g div bits) packs bits (g mod bits). */
  def bandSigs(wordHashes: DataFrame, bits: Int, bands: Int = Bands): DataFrame =
    wordHashes
      .select(col("doc_id"), col("x"),
        explode(expr(s"sequence(0L, ${bands.toLong * bits - 1}L)")).as("g"))
      .select(col("doc_id"), col("g"),
        expr("CASE WHEN ((x*31 + g*97 + 11) * (x*31 + g*97 + 11)) " +
          "% 2147483647 % 2 = 0 THEN 1L ELSE -1L END").as("vote"))
      .groupBy("doc_id", "g")
      .agg(sum("vote").as("s"))
      .select(col("doc_id"), expr(s"g div $bits").as("band"),
        expr(s"CASE WHEN s > 0 THEN shiftleft(1L, CAST(g % $bits AS INT)) " +
          "ELSE 0L END").as("bitval"))
      .groupBy("doc_id", "band")
      .agg(sum("bitval").cast("long").as("sig"))

  /** Distinct unordered candidate pairs (doc_a < doc_b) colliding in ≥1
    * band on the low-`keyBits` projection of the band sig — a
    * hash-partitioned equi-join on (band, key), never all-pairs. */
  def candidatePairs(sigs: DataFrame, keyBits: Int): DataFrame = {
    val keyed = sigs.select(col("doc_id"), col("band"),
      expr(s"sig % ${1L << keyBits}L").as("key"))
    keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Near-duplicate pairs: candidates whose FULL fingerprint Hamming
    * distance (summed across the per-band longs) is ≤ `maxHamming`.
    * The exact check touches candidates only — recall for the criterion
    * is total by the pigeonhole argument when maxHamming ≤ Bands − 1
    * (and survives the key projection: an equal band ⇒ an equal key). */
  def nearDupPairs(sigs: DataFrame, keyBits: Int,
                   maxHamming: Int = HammingRadius): DataFrame = {
    require(maxHamming <= Bands - 1,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) <= Bands - 1 (${Bands - 1})")
    val a = sigs.select(col("doc_id").as("doc_a"), col("band"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("band"), col("sig").as("sigb"))
    candidatePairs(sigs, keyBits)
      .join(a, "doc_a")
      .join(b, Seq("doc_b", "band"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(expr("bit_count(siga ^ sigb)")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
